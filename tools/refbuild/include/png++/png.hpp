// Minimal png++-compatible shim over libpng — just the API surface the
// RGKrt reference uses (texture.cpp: read an RGB image from a path,
// create one in memory, pixel get/set via get_pixel/operator[], write).
// Hand-written for this repo (tools/refbuild); NOT the real png++.
#ifndef RGK_MINI_PNGPP_HPP
#define RGK_MINI_PNGPP_HPP

#include <png.h>

#include <cstdio>
#include <cstdint>
#include <fstream>
#include <stdexcept>
#include <string>
#include <vector>

namespace png {

typedef png_uint_32 uint_32;

struct rgb_pixel {
    uint8_t red, green, blue;
    rgb_pixel() : red(0), green(0), blue(0) {}
    rgb_pixel(uint8_t r, uint8_t g, uint8_t b) : red(r), green(g), blue(b) {}
};

template <typename Pixel>
class image {
public:
    image(uint_32 w, uint_32 h) : width_(w), height_(h), data_(size_t(w) * h) {}

    explicit image(const std::string& path) { read(path); }

    uint_32 get_width() const { return width_; }
    uint_32 get_height() const { return height_; }

    Pixel get_pixel(uint_32 x, uint_32 y) const {
        return data_[size_t(y) * width_ + x];
    }
    void set_pixel(uint_32 x, uint_32 y, Pixel p) {
        data_[size_t(y) * width_ + x] = p;
    }

    // row proxy so `image[y][x] = px` works
    Pixel* operator[](uint_32 y) { return &data_[size_t(y) * width_]; }
    const Pixel* operator[](uint_32 y) const { return &data_[size_t(y) * width_]; }

    void read(const std::string& path) {
        FILE* fp = std::fopen(path.c_str(), "rb");
        if (!fp) throw std::runtime_error("cannot open PNG: " + path);
        png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING,
                                                 nullptr, nullptr, nullptr);
        png_infop info = png_create_info_struct(png);
        if (setjmp(png_jmpbuf(png))) {
            png_destroy_read_struct(&png, &info, nullptr);
            std::fclose(fp);
            throw std::runtime_error("PNG read error: " + path);
        }
        png_init_io(png, fp);
        png_read_info(png, info);
        width_ = png_get_image_width(png, info);
        height_ = png_get_image_height(png, info);
        int color = png_get_color_type(png, info);
        int depth = png_get_bit_depth(png, info);
        // Normalize everything to 8-bit RGB.
        if (depth == 16) png_set_strip_16(png);
        if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
        if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
            png_set_expand_gray_1_2_4_to_8(png);
        if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
        if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
            png_set_gray_to_rgb(png);
        if (color & PNG_COLOR_MASK_ALPHA ||
            png_get_valid(png, info, PNG_INFO_tRNS))
            png_set_strip_alpha(png);
        png_read_update_info(png, info);

        data_.assign(size_t(width_) * height_, Pixel());
        std::vector<png_bytep> rows(height_);
        std::vector<uint8_t> raw(size_t(width_) * height_ * 3);
        for (uint_32 y = 0; y < height_; y++)
            rows[y] = raw.data() + size_t(y) * width_ * 3;
        png_read_image(png, rows.data());
        png_destroy_read_struct(&png, &info, nullptr);
        std::fclose(fp);
        for (size_t i = 0; i < data_.size(); i++)
            data_[i] = Pixel(raw[i * 3], raw[i * 3 + 1], raw[i * 3 + 2]);
    }

    void write(const std::string& path) const {
        FILE* fp = std::fopen(path.c_str(), "wb");
        if (!fp) throw std::runtime_error("cannot write PNG: " + path);
        png_structp png = png_create_write_struct(PNG_LIBPNG_VER_STRING,
                                                  nullptr, nullptr, nullptr);
        png_infop info = png_create_info_struct(png);
        if (setjmp(png_jmpbuf(png))) {
            png_destroy_write_struct(&png, &info);
            std::fclose(fp);
            throw std::runtime_error("PNG write error: " + path);
        }
        png_init_io(png, fp);
        png_set_IHDR(png, info, width_, height_, 8, PNG_COLOR_TYPE_RGB,
                     PNG_INTERLACE_NONE, PNG_COMPRESSION_TYPE_DEFAULT,
                     PNG_FILTER_TYPE_DEFAULT);
        png_write_info(png, info);
        std::vector<uint8_t> row(size_t(width_) * 3);
        for (uint_32 y = 0; y < height_; y++) {
            for (uint_32 x = 0; x < width_; x++) {
                Pixel p = data_[size_t(y) * width_ + x];
                row[x * 3] = p.red;
                row[x * 3 + 1] = p.green;
                row[x * 3 + 2] = p.blue;
            }
            png_write_row(png, row.data());
        }
        png_write_end(png, nullptr);
        png_destroy_write_struct(&png, &info);
        std::fclose(fp);
    }

private:
    uint_32 width_ = 0, height_ = 0;
    std::vector<Pixel> data_;
};

}  // namespace png

#endif  // RGK_MINI_PNGPP_HPP
