// exr2npy: dump any OpenEXR image (incl. the reference renderer's
// PIZ-compressed RGBA output, reference src/texture.cpp:356-374) to a
// raw float32 .npy [H, W, 4] for golden-image comparisons.
//
// Build (see build.sh):  g++ exr2npy.cpp -o exr2npy $(pkg-config
//   --cflags --libs OpenEXR)
// Usage: exr2npy in.exr out.npy
#include <ImfRgbaFile.h>
#include <ImfArray.h>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>

int main(int argc, char** argv) {
  if (argc != 3) {
    fprintf(stderr, "usage: exr2npy in.exr out.npy\n");
    return 2;
  }
  Imf::RgbaInputFile in(argv[1]);
  Imath::Box2i dw = in.dataWindow();
  const int w = dw.max.x - dw.min.x + 1;
  const int h = dw.max.y - dw.min.y + 1;
  Imf::Array2D<Imf::Rgba> px(h, w);
  in.setFrameBuffer(&px[0][0] - dw.min.x - dw.min.y * w, 1, w);
  in.readPixels(dw.min.y, dw.max.y);

  // Minimal .npy v1.0 writer.
  char dict[256];
  int n = snprintf(dict, sizeof dict,
                   "{'descr': '<f4', 'fortran_order': False, "
                   "'shape': (%d, %d, 4), }", h, w);
  int header = 10 + n;
  int pad = (64 - header % 64) % 64;
  FILE* f = fopen(argv[2], "wb");
  if (!f) { perror("fopen"); return 1; }
  uint16_t hlen = (uint16_t)(n + pad);
  fwrite("\x93NUMPY\x01\x00", 1, 8, f);
  fwrite(&hlen, 2, 1, f);
  fwrite(dict, 1, n, f);
  for (int i = 0; i < pad - 1; i++) fputc(' ', f);
  fputc('\n', f);
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      float v[4] = {px[y][x].r, px[y][x].g, px[y][x].b, px[y][x].a};
      fwrite(v, 4, 4, f);
    }
  fclose(f);
  return 0;
}
