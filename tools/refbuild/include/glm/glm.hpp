// Minimal GLM-compatible math shim — just enough of the glm API surface
// to compile the RGKrt reference renderer for golden-image generation.
// Hand-written for this repo (tools/refbuild); NOT the real glm library.
// Column-major matrices, float-only, GLM_FORCE_RADIANS semantics,
// function-style swizzles (.xyz(), .xy()).
#ifndef RGK_MINI_GLM_HPP
#define RGK_MINI_GLM_HPP

#include <algorithm>
#include <cmath>
#include <string>
#include <sstream>

namespace glm {

typedef unsigned int uint;

// ---------------------------------------------------------------- vec2
struct vec2 {
    float x, y;
    vec2() : x(0), y(0) {}
    explicit vec2(float s) : x(s), y(s) {}
    vec2(float x_, float y_) : x(x_), y(y_) {}
    float&       operator[](int i)       { return (&x)[i]; }
    const float& operator[](int i) const { return (&x)[i]; }
};
inline vec2 operator+(vec2 a, vec2 b) { return vec2(a.x + b.x, a.y + b.y); }
inline vec2 operator-(vec2 a, vec2 b) { return vec2(a.x - b.x, a.y - b.y); }
inline vec2 operator*(vec2 a, vec2 b) { return vec2(a.x * b.x, a.y * b.y); }
inline vec2 operator*(vec2 a, float s) { return vec2(a.x * s, a.y * s); }
inline vec2 operator*(float s, vec2 a) { return vec2(a.x * s, a.y * s); }
inline vec2 operator/(vec2 a, float s) { return vec2(a.x / s, a.y / s); }
inline vec2 operator-(vec2 a) { return vec2(-a.x, -a.y); }
inline vec2& operator+=(vec2& a, vec2 b) { a.x += b.x; a.y += b.y; return a; }
inline vec2& operator-=(vec2& a, vec2 b) { a.x -= b.x; a.y -= b.y; return a; }
inline vec2& operator*=(vec2& a, float s) { a.x *= s; a.y *= s; return a; }
inline bool operator==(vec2 a, vec2 b) { return a.x == b.x && a.y == b.y; }
inline bool operator!=(vec2 a, vec2 b) { return !(a == b); }

// ---------------------------------------------------------------- vec3
struct vec3 {
    union { float x; float r; };
    union { float y; float g; };
    union { float z; float b; };
    vec3() : x(0), y(0), z(0) {}
    explicit vec3(float s) : x(s), y(s), z(s) {}
    vec3(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}
    vec3(vec2 v, float z_) : x(v.x), y(v.y), z(z_) {}
    float&       operator[](int i)       { return (&x)[i]; }
    const float& operator[](int i) const { return (&x)[i]; }
    vec2 xy() const { return vec2(x, y); }
};
inline vec3 operator+(vec3 a, vec3 b) { return vec3(a.x + b.x, a.y + b.y, a.z + b.z); }
inline vec3 operator-(vec3 a, vec3 b) { return vec3(a.x - b.x, a.y - b.y, a.z - b.z); }
inline vec3 operator*(vec3 a, vec3 b) { return vec3(a.x * b.x, a.y * b.y, a.z * b.z); }
inline vec3 operator/(vec3 a, vec3 b) { return vec3(a.x / b.x, a.y / b.y, a.z / b.z); }
inline vec3 operator*(vec3 a, float s) { return vec3(a.x * s, a.y * s, a.z * s); }
inline vec3 operator*(float s, vec3 a) { return vec3(a.x * s, a.y * s, a.z * s); }
inline vec3 operator/(vec3 a, float s) { return vec3(a.x / s, a.y / s, a.z / s); }
inline vec3 operator/(float s, vec3 a) { return vec3(s / a.x, s / a.y, s / a.z); }
inline vec3 operator-(vec3 a) { return vec3(-a.x, -a.y, -a.z); }
inline vec3& operator+=(vec3& a, vec3 b) { a.x += b.x; a.y += b.y; a.z += b.z; return a; }
inline vec3& operator-=(vec3& a, vec3 b) { a.x -= b.x; a.y -= b.y; a.z -= b.z; return a; }
inline vec3& operator*=(vec3& a, float s) { a.x *= s; a.y *= s; a.z *= s; return a; }
inline vec3& operator/=(vec3& a, float s) { a.x /= s; a.y /= s; a.z /= s; return a; }
inline bool operator==(vec3 a, vec3 b) { return a.x == b.x && a.y == b.y && a.z == b.z; }
inline bool operator!=(vec3 a, vec3 b) { return !(a == b); }

// ---------------------------------------------------------------- vec4
struct vec4 {
    union { float x; float r; };
    union { float y; float g; };
    union { float z; float b; };
    union { float w; float a; };
    vec4() : x(0), y(0), z(0), w(0) {}
    explicit vec4(float s) : x(s), y(s), z(s), w(s) {}
    vec4(float x_, float y_, float z_, float w_) : x(x_), y(y_), z(z_), w(w_) {}
    vec4(vec3 v, float w_) : x(v.x), y(v.y), z(v.z), w(w_) {}
    float&       operator[](int i)       { return (&x)[i]; }
    const float& operator[](int i) const { return (&x)[i]; }
    vec3 xyz() const { return vec3(x, y, z); }
};
inline vec4 operator+(vec4 a, vec4 b) { return vec4(a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w); }
inline vec4 operator-(vec4 a, vec4 b) { return vec4(a.x - b.x, a.y - b.y, a.z - b.z, a.w - b.w); }
inline vec4 operator*(vec4 a, float s) { return vec4(a.x * s, a.y * s, a.z * s, a.w * s); }
inline vec4 operator*(float s, vec4 a) { return a * s; }
inline vec4 operator-(vec4 a) { return vec4(-a.x, -a.y, -a.z, -a.w); }

// ---------------------------------------------------------------- mat3
struct mat4;
struct mat3 {
    vec3 c[3];  // columns
    mat3() { c[0] = vec3(1, 0, 0); c[1] = vec3(0, 1, 0); c[2] = vec3(0, 0, 1); }
    explicit mat3(float s) { c[0] = vec3(s, 0, 0); c[1] = vec3(0, s, 0); c[2] = vec3(0, 0, s); }
    mat3(vec3 c0, vec3 c1, vec3 c2) { c[0] = c0; c[1] = c1; c[2] = c2; }
    // column-major scalar ctor, like glm: first three = column 0
    mat3(float x0, float y0, float z0, float x1, float y1, float z1,
         float x2, float y2, float z2) {
        c[0] = vec3(x0, y0, z0); c[1] = vec3(x1, y1, z1); c[2] = vec3(x2, y2, z2);
    }
    explicit inline mat3(const mat4& m);
    vec3&       operator[](int i)       { return c[i]; }
    const vec3& operator[](int i) const { return c[i]; }
};
inline vec3 operator*(const mat3& m, vec3 v) {
    return m.c[0] * v.x + m.c[1] * v.y + m.c[2] * v.z;
}
inline mat3 operator*(const mat3& a, const mat3& b) {
    return mat3(a * b.c[0], a * b.c[1], a * b.c[2]);
}
inline mat3 operator*(const mat3& m, float s) {
    return mat3(m.c[0] * s, m.c[1] * s, m.c[2] * s);
}
inline mat3 operator*(float s, const mat3& m) { return m * s; }
inline mat3 operator+(const mat3& a, const mat3& b) {
    return mat3(a.c[0] + b.c[0], a.c[1] + b.c[1], a.c[2] + b.c[2]);
}

// ---------------------------------------------------------------- mat4
struct mat4 {
    vec4 c[4];  // columns
    mat4() {
        c[0] = vec4(1, 0, 0, 0); c[1] = vec4(0, 1, 0, 0);
        c[2] = vec4(0, 0, 1, 0); c[3] = vec4(0, 0, 0, 1);
    }
    explicit mat4(float s) {
        c[0] = vec4(s, 0, 0, 0); c[1] = vec4(0, s, 0, 0);
        c[2] = vec4(0, 0, s, 0); c[3] = vec4(0, 0, 0, s);
    }
    vec4&       operator[](int i)       { return c[i]; }
    const vec4& operator[](int i) const { return c[i]; }
};
inline mat3::mat3(const mat4& m) {
    c[0] = m.c[0].xyz(); c[1] = m.c[1].xyz(); c[2] = m.c[2].xyz();
}
inline vec4 operator*(const mat4& m, vec4 v) {
    return m.c[0] * v.x + m.c[1] * v.y + m.c[2] * v.z + m.c[3] * v.w;
}
inline mat4 operator*(const mat4& a, const mat4& b) {
    mat4 r;
    for (int i = 0; i < 4; i++) r.c[i] = a * b.c[i];
    return r;
}

// ---------------------------------------------------------------- quat
struct quat {
    float w, x, y, z;           // glm order in the (w,x,y,z) ctor
    quat() : w(1), x(0), y(0), z(0) {}
    quat(float w_, float x_, float y_, float z_) : w(w_), x(x_), y(y_), z(z_) {}
};
inline vec3 operator*(const quat& q, vec3 v) {
    vec3 u(q.x, q.y, q.z);
    vec3 t(u.y * v.z - u.z * v.y, u.z * v.x - u.x * v.z, u.x * v.y - u.y * v.x);
    t = t * 2.0f;
    vec3 tt(u.y * t.z - u.z * t.y, u.z * t.x - u.x * t.z, u.x * t.y - u.y * t.x);
    return v + t * q.w + tt;
}
inline quat operator*(const quat& a, const quat& b) {
    return quat(a.w * b.w - a.x * b.x - a.y * b.y - a.z * b.z,
                a.w * b.x + a.x * b.w + a.y * b.z - a.z * b.y,
                a.w * b.y - a.x * b.z + a.y * b.w + a.z * b.x,
                a.w * b.z + a.x * b.y - a.y * b.x + a.z * b.w);
}
inline quat inverse(const quat& q) {
    float n = q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z;
    return quat(q.w / n, -q.x / n, -q.y / n, -q.z / n);
}
inline quat angleAxis(float angle, vec3 axis) {
    float s = std::sin(angle * 0.5f);
    return quat(std::cos(angle * 0.5f), axis.x * s, axis.y * s, axis.z * s);
}

// ---------------------------------------------------------------- scalar funcs
template <typename T> inline T pi() { return T(3.14159265358979323846); }
inline float radians(float d) { return d * 0.01745329251994329577f; }
inline float degrees(float r) { return r * 57.2957795130823208768f; }
template <typename T> inline T max(T a, T b) { return a > b ? a : b; }
template <typename T> inline T min(T a, T b) { return a < b ? a : b; }
inline float abs(float x) { return std::fabs(x); }
inline vec3 abs(vec3 v) { return vec3(std::fabs(v.x), std::fabs(v.y), std::fabs(v.z)); }
inline vec3 max(vec3 a, vec3 b) {
    return vec3(a.x > b.x ? a.x : b.x, a.y > b.y ? a.y : b.y, a.z > b.z ? a.z : b.z);
}
inline vec3 min(vec3 a, vec3 b) {
    return vec3(a.x < b.x ? a.x : b.x, a.y < b.y ? a.y : b.y, a.z < b.z ? a.z : b.z);
}
inline float sqrt(float x) { return std::sqrt(x); }
inline float pow(float x, float y) { return std::pow(x, y); }
inline float exp(float x) { return std::exp(x); }
inline float sin(float x) { return std::sin(x); }
inline float cos(float x) { return std::cos(x); }
inline float tan(float x) { return std::tan(x); }
inline float asin(float x) { return std::asin(x); }
inline float acos(float x) { return std::acos(x); }
inline float atan(float x) { return std::atan(x); }
inline float atan(float y, float x) { return std::atan2(y, x); }
inline bool isnan(float x) { return std::isnan(x); }
inline float clamp(float x, float lo, float hi) { return x < lo ? lo : (x > hi ? hi : x); }
// gtx/wrap: repeat() wraps a coordinate into [0, 1)
inline float repeat(float x) { return x - std::floor(x); }

// ---------------------------------------------------------------- vector funcs
inline float dot(vec2 a, vec2 b) { return a.x * b.x + a.y * b.y; }
inline float dot(vec3 a, vec3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline float dot(vec4 a, vec4 b) { return a.x * b.x + a.y * b.y + a.z * b.z + a.w * b.w; }
inline vec3 cross(vec3 a, vec3 b) {
    return vec3(a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x);
}
inline float length(vec2 v) { return std::sqrt(dot(v, v)); }
inline float length(vec3 v) { return std::sqrt(dot(v, v)); }
inline float length2(vec3 v) { return dot(v, v); }
inline float distance(vec3 a, vec3 b) { return length(a - b); }
inline float distance2(vec3 a, vec3 b) { return dot(a - b, a - b); }
inline vec2 normalize(vec2 v) { return v / length(v); }
inline vec3 normalize(vec3 v) { return v / length(v); }
// gtx/vector_angle (assumes unit inputs, like glm)
inline float angle(vec3 a, vec3 b) { return std::acos(clamp(dot(a, b), -1.0f, 1.0f)); }

// ---------------------------------------------------------------- matrix funcs
inline float determinant(const mat3& m) {
    return m[0][0] * (m[1][1] * m[2][2] - m[2][1] * m[1][2])
         - m[1][0] * (m[0][1] * m[2][2] - m[2][1] * m[0][2])
         + m[2][0] * (m[0][1] * m[1][2] - m[1][1] * m[0][2]);
}
inline mat3 inverse(const mat3& m) {
    float d = determinant(m);
    float id = 1.0f / d;
    mat3 r;
    r[0][0] =  (m[1][1] * m[2][2] - m[2][1] * m[1][2]) * id;
    r[1][0] = -(m[1][0] * m[2][2] - m[2][0] * m[1][2]) * id;
    r[2][0] =  (m[1][0] * m[2][1] - m[2][0] * m[1][1]) * id;
    r[0][1] = -(m[0][1] * m[2][2] - m[2][1] * m[0][2]) * id;
    r[1][1] =  (m[0][0] * m[2][2] - m[2][0] * m[0][2]) * id;
    r[2][1] = -(m[0][0] * m[2][1] - m[2][0] * m[0][1]) * id;
    r[0][2] =  (m[0][1] * m[1][2] - m[1][1] * m[0][2]) * id;
    r[1][2] = -(m[0][0] * m[1][2] - m[1][0] * m[0][2]) * id;
    r[2][2] =  (m[0][0] * m[1][1] - m[1][0] * m[0][1]) * id;
    return r;
}

// gtx/transform: affine builders
inline mat4 translate(vec3 t) {
    mat4 m;
    m[3] = vec4(t, 1.0f);
    return m;
}
inline mat4 scale(vec3 s) {
    mat4 m;
    m[0][0] = s.x; m[1][1] = s.y; m[2][2] = s.z;
    return m;
}
inline mat4 rotate(float angle, vec3 axis) {
    vec3 a = normalize(axis);
    float c = std::cos(angle), s = std::sin(angle), t = 1.0f - c;
    mat4 m;
    m[0] = vec4(c + a.x * a.x * t, a.y * a.x * t + a.z * s, a.z * a.x * t - a.y * s, 0);
    m[1] = vec4(a.x * a.y * t - a.z * s, c + a.y * a.y * t, a.z * a.y * t + a.x * s, 0);
    m[2] = vec4(a.x * a.z * t + a.y * s, a.y * a.z * t - a.x * s, c + a.z * a.z * t, 0);
    m[3] = vec4(0, 0, 0, 1);
    return m;
}
// gtx/rotate_vector: rotate a vector about an axis
inline vec3 rotate(vec3 v, float angle, vec3 axis) {
    return mat3(rotate(angle, axis)) * v;
}

// ---------------------------------------------------------------- string_cast
inline std::string to_string(vec2 v) {
    std::ostringstream o;
    o << "vec2(" << v.x << ", " << v.y << ")";
    return o.str();
}
inline std::string to_string(vec3 v) {
    std::ostringstream o;
    o << "vec3(" << v.x << ", " << v.y << ", " << v.z << ")";
    return o.str();
}
inline std::string to_string(vec4 v) {
    std::ostringstream o;
    o << "vec4(" << v.x << ", " << v.y << ", " << v.z << ", " << v.w << ")";
    return o.str();
}
inline std::string to_string(const mat3& m) {
    std::ostringstream o;
    o << "mat3(" << to_string(m[0]) << ", " << to_string(m[1]) << ", "
      << to_string(m[2]) << ")";
    return o.str();
}
inline std::string to_string(const mat4& m) {
    std::ostringstream o;
    o << "mat4(" << to_string(m[0]) << ", " << to_string(m[1]) << ", "
      << to_string(m[2]) << ", " << to_string(m[3]) << ")";
    return o.str();
}

}  // namespace glm

#endif  // RGK_MINI_GLM_HPP
