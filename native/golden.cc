// Native golden-reference path tracer (scalar, obviously-correct C++).
//
// Mirrors rrt_tpu/golden.py: a direct recursive implementation of the
// books' method in the style of the reference's `trace` + linear
// `closest_hit` scan (reference: src/lib.rs:32-47,50-71), used as an
// allclose oracle for the device renderer. It consumes the same
// precomputed per-(ray, bounce) draw tensors as the wavefront loop, so
// radiance must match per ray.
//
// Build: g++ -O2 -shared -fPIC -o libgolden.so golden.cc
// Driven from Python via ctypes (rrt_tpu/golden_native.py).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <initializer_list>

namespace {

constexpr float kInf = 3.0e38f;

struct Vec3 {
  double x = 0, y = 0, z = 0;
  Vec3 operator+(const Vec3& o) const { return {x + o.x, y + o.y, z + o.z}; }
  Vec3 operator-(const Vec3& o) const { return {x - o.x, y - o.y, z - o.z}; }
  Vec3 operator*(double s) const { return {x * s, y * s, z * s}; }
  Vec3 operator*(const Vec3& o) const { return {x * o.x, y * o.y, z * o.z}; }
  double dot(const Vec3& o) const { return x * o.x + y * o.y + z * o.z; }
  Vec3 cross(const Vec3& o) const {
    return {y * o.z - z * o.y, z * o.x - x * o.z, x * o.y - y * o.x};
  }
  double norm() const { return std::sqrt(dot(*this)); }
  Vec3 normalized() const {
    double n = norm();
    return n > 0 ? (*this) * (1.0 / n) : Vec3{0, 0, 0};
  }
};

Vec3 load3(const float* p, int i) {
  return {p[3 * i], p[3 * i + 1], p[3 * i + 2]};
}

}  // namespace

extern "C" {

// Flattened scene (mirrors SceneArrays; all pointers borrowed).
struct GoldenScene {
  // spheres
  int32_t n_spheres;
  const float* sphere_c0;      // (S,3)
  const float* sphere_dc;      // (S,3)
  const float* sphere_t0;      // (S,)
  const float* sphere_inv_dt;  // (S,)
  const float* sphere_radius;  // (S,)
  const int32_t* sphere_mat;   // (S,)
  const uint8_t* sphere_valid;
  // quads
  int32_t n_quads;
  const float* quad_q;  // (Q,3)
  const float* quad_u;
  const float* quad_v;
  const int32_t* quad_mat;
  const uint8_t* quad_valid;
  // media
  int32_t n_media;
  const int32_t* med_btype;  // 0 sphere, 1 obb
  const float* med_center;   // (D,3)
  const float* med_radius;
  const float* med_half;  // (D,3)
  const float* med_rot;   // (D,9) row-major world-from-box
  const float* med_neg_inv_density;
  const int32_t* med_mat;
  const uint8_t* med_valid;
  // materials
  const int32_t* mat_type;
  const int32_t* mat_tex;
  const float* mat_fuzz;
  const float* mat_ior;
  // textures
  const int32_t* tex_type;
  const float* tex_color1;  // (T,3)
  const float* tex_color2;
  const float* tex_scale;
  const int32_t* tex_image;
  // images
  int32_t n_images, img_h, img_w;
  const float* images;  // (I,H,W,3)
  // background
  int32_t bg_mode;  // 0 sky, 1 solid
  const float* bg_bottom;
  const float* bg_top;
};

}  // extern "C"

namespace {

constexpr int kMatLambertian = 0, kMatMetal = 1, kMatDielectric = 2,
              kMatLight = 3, kMatIsotropic = 4;
constexpr int kTexSolid = 0, kTexChecker = 1, kTexPerlin = 2, kTexImage = 3;

struct HitInfo {
  double t = kInf;
  int fam = -1;  // 0 sphere, 1 quad, 2 medium
  int idx = -1;
};

void hit_spheres(const GoldenScene& s, const Vec3& o, const Vec3& d,
                 double time, double t_min, HitInfo* best) {
  for (int i = 0; i < s.n_spheres; ++i) {
    if (!s.sphere_valid[i]) continue;
    double f = (time - s.sphere_t0[i]) * s.sphere_inv_dt[i];
    Vec3 center = load3(s.sphere_c0, i) + load3(s.sphere_dc, i) * f;
    Vec3 oc = o - center;
    double a = d.dot(d);
    double half_b = oc.dot(d);
    double r = s.sphere_radius[i];
    double c = oc.dot(oc) - r * r;
    double disc = half_b * half_b - a * c;
    if (disc <= 0.0) continue;
    double sq = std::sqrt(disc);
    for (double root : {(-half_b - sq) / a, (-half_b + sq) / a}) {
      if (root > t_min && root < best->t) {
        best->t = root;
        best->fam = 0;
        best->idx = i;
        break;
      }
      if (root > t_min) break;  // near root beyond best: far is farther
    }
  }
}

void hit_quads(const GoldenScene& s, const Vec3& o, const Vec3& d,
               double t_min, HitInfo* best) {
  for (int i = 0; i < s.n_quads; ++i) {
    if (!s.quad_valid[i]) continue;
    Vec3 q = load3(s.quad_q, i), u = load3(s.quad_u, i),
         v = load3(s.quad_v, i);
    Vec3 n = u.cross(v);
    double denom = n.dot(d);
    if (std::fabs(denom) <= 1e-8 * n.norm() * d.norm()) continue;
    double t = (n.dot(q) - n.dot(o)) / denom;
    if (t <= t_min || t >= best->t) continue;
    Vec3 p = o + d * t;
    Vec3 w = n * (1.0 / n.dot(n));
    double alpha = w.dot((p - q).cross(v));
    double beta = w.dot(u.cross(p - q));
    if (alpha >= 0.0 && alpha <= 1.0 && beta >= 0.0 && beta <= 1.0) {
      best->t = t;
      best->fam = 1;
      best->idx = i;
    }
  }
}

bool medium_interval(const GoldenScene& s, int i, const Vec3& o,
                     const Vec3& d, double* lo, double* hi) {
  if (s.med_btype[i] == 0) {
    Vec3 oc = o - load3(s.med_center, i);
    double a = d.dot(d);
    double half_b = oc.dot(d);
    double r = s.med_radius[i];
    double c = oc.dot(oc) - r * r;
    double disc = half_b * half_b - a * c;
    if (disc <= 0.0) return false;
    double sq = std::sqrt(disc);
    *lo = (-half_b - sq) / a;
    *hi = (-half_b + sq) / a;
    return true;
  }
  const float* R = s.med_rot + 9 * i;  // world-from-box, row major
  Vec3 oc = o - load3(s.med_center, i);
  // box frame: R^T * v
  Vec3 ob = {R[0] * oc.x + R[3] * oc.y + R[6] * oc.z,
             R[1] * oc.x + R[4] * oc.y + R[7] * oc.z,
             R[2] * oc.x + R[5] * oc.y + R[8] * oc.z};
  Vec3 db = {R[0] * d.x + R[3] * d.y + R[6] * d.z,
             R[1] * d.x + R[4] * d.y + R[7] * d.z,
             R[2] * d.x + R[5] * d.y + R[8] * d.z};
  double l = -1e308, h = 1e308;
  const double ob_[3] = {ob.x, ob.y, ob.z}, db_[3] = {db.x, db.y, db.z};
  for (int k = 0; k < 3; ++k) {
    double half = s.med_half[3 * i + k];
    if (std::fabs(db_[k]) <= 1e-12) {
      if (std::fabs(ob_[k]) > half) return false;
      continue;
    }
    double t1 = (-half - ob_[k]) / db_[k], t2 = (half - ob_[k]) / db_[k];
    l = std::fmax(l, std::fmin(t1, t2));
    h = std::fmin(h, std::fmax(t1, t2));
  }
  if (l >= h) return false;
  *lo = l;
  *hi = h;
  return true;
}

void hit_media(const GoldenScene& s, const Vec3& o, const Vec3& d,
               double t_min, const float* u_med, HitInfo* best) {
  for (int i = 0; i < s.n_media; ++i) {
    if (!s.med_valid[i]) continue;
    double lo, hi;
    if (!medium_interval(s, i, o, d, &lo, &hi)) continue;
    double te = std::fmax(lo, t_min), tx = std::fmin(hi, (double)best->t);
    if (te >= tx) continue;
    te = std::fmax(te, 0.0);
    if (te >= tx) continue;
    double dlen = d.norm();
    double dist_inside = (tx - te) * dlen;
    double u = std::fmax((double)u_med[i], 1e-12);
    double hit_dist = (double)s.med_neg_inv_density[i] * std::log(u);
    if (hit_dist > dist_inside) continue;
    double t = te + hit_dist / dlen;
    if (t < best->t) {
      best->t = t;
      best->fam = 2;
      best->idx = i;
    }
  }
}

Vec3 lattice_grad(int ix, int iy, int iz) {
  // Hashed lattice gradient — must match rrt_tpu/textures.py.
  uint32_t h = (uint32_t)ix * 0x8DA6B343u + (uint32_t)iy * 0xD8163841u +
               (uint32_t)iz * 0xCB1AB31Fu;
  h ^= h >> 13;
  h *= 0x85EBCA6Bu;
  h ^= h >> 16;
  const double scale = 2.0 / 1024.0;
  Vec3 g = {(double)(h & 1023u) * scale - 1.0,
            (double)((h >> 10) & 1023u) * scale - 1.0,
            (double)((h >> 20) & 1023u) * scale - 1.0};
  double n = std::sqrt(std::fmax(g.dot(g), 1e-6));
  return g * (1.0 / n);
}

double perlin_noise(const GoldenScene& s, const Vec3& p) {
  double uf = p.x - std::floor(p.x), vf = p.y - std::floor(p.y),
         wf = p.z - std::floor(p.z);
  int i = (int)std::floor(p.x), j = (int)std::floor(p.y),
      k = (int)std::floor(p.z);
  double uu = uf * uf * (3 - 2 * uf), vv = vf * vf * (3 - 2 * vf),
         ww = wf * wf * (3 - 2 * wf);
  double acc = 0;
  for (int di = 0; di < 2; ++di)
    for (int dj = 0; dj < 2; ++dj)
      for (int dk = 0; dk < 2; ++dk) {
        Vec3 grad = lattice_grad(i + di, j + dj, k + dk);
        Vec3 weight = {uf - di, vf - dj, wf - dk};
        double w = (di ? uu : 1 - uu) * (dj ? vv : 1 - vv) *
                   (dk ? ww : 1 - ww);
        acc += w * grad.dot(weight);
      }
  return acc;
}

double perlin_turb(const GoldenScene& s, Vec3 p, int depth = 7) {
  double acc = 0, weight = 1;
  for (int d = 0; d < depth; ++d) {
    acc += weight * std::fabs(perlin_noise(s, p));
    p = p * 2.0;
    weight *= 0.5;
  }
  return acc;
}

Vec3 texture(const GoldenScene& s, int tex_id, double u, double v,
             const Vec3& p) {
  int tt = s.tex_type[tex_id];
  Vec3 c1 = load3(s.tex_color1, tex_id);
  if (tt == kTexSolid) return c1;
  double scale = s.tex_scale[tex_id];
  if (tt == kTexChecker) {
    double sines = std::sin(scale * p.x) * std::sin(scale * p.y) *
                   std::sin(scale * p.z);
    return sines < 0.0 ? load3(s.tex_color2, tex_id) : c1;
  }
  if (tt == kTexPerlin) {
    return c1 * (0.5 * (1.0 + std::sin(scale * p.z +
                                       10.0 * perlin_turb(s, p))));
  }
  // image
  int img = s.tex_image[tex_id];
  double uc = std::fmin(std::fmax(u, 0.0), 1.0);
  double vc = 1.0 - std::fmin(std::fmax(v, 0.0), 1.0);
  int xi = std::min((int)(uc * s.img_w), s.img_w - 1);
  int yi = std::min((int)(vc * s.img_h), s.img_h - 1);
  const float* px =
      s.images + ((img * s.img_h + yi) * s.img_w + xi) * 3;
  return {px[0], px[1], px[2]};
}

Vec3 reflect(const Vec3& v, const Vec3& n) {
  return v - n * (2.0 * v.dot(n));
}

Vec3 refract(const Vec3& unit_d, const Vec3& n, double ratio) {
  double cos_theta = std::fmin(-unit_d.dot(n), 1.0);
  Vec3 r_perp = (unit_d + n * cos_theta) * ratio;
  double k = 1.0 - r_perp.dot(r_perp);
  Vec3 r_par = n * (-std::sqrt(std::fmax(k, 0.0)));
  return r_perp + r_par;
}

double schlick(double cosine, double ref_idx) {
  double r0 = (1 - ref_idx) / (1 + ref_idx);
  r0 = r0 * r0;
  return r0 + (1 - r0) * std::pow(1 - cosine, 5.0);
}

}  // namespace

extern "C" {

// Trace one ray. draws_* are (max_depth+1, n_rays, k) tensors shared with
// the device renderer; ray_idx selects this ray's slice.
void rrt_golden_trace_ray(const GoldenScene* sp, const float* o_in,
                          const float* d_in, float time, int ray_idx,
                          int n_rays, int max_depth, float t_min,
                          const float* draws_unit,    // (B,N,3)
                          const float* draws_sphere,  // (B,N,3)
                          const float* draws_choice,  // (B,N)
                          const float* draws_medium,  // (B,N,D')
                          int med_stride, float* out_radiance) {
  const GoldenScene& s = *sp;
  Vec3 o = {o_in[0], o_in[1], o_in[2]};
  Vec3 d = {d_in[0], d_in[1], d_in[2]};
  Vec3 throughput = {1, 1, 1};
  Vec3 radiance = {0, 0, 0};

  for (int bounce = 0; bounce <= max_depth; ++bounce) {
    HitInfo best;
    hit_spheres(s, o, d, time, t_min, &best);
    hit_quads(s, o, d, t_min, &best);
    const float* u_med =
        draws_medium + ((size_t)bounce * n_rays + ray_idx) * med_stride;
    hit_media(s, o, d, t_min, u_med, &best);

    if (best.idx < 0 || best.t >= kInf) {  // miss -> background
      Vec3 bg;
      if (s.bg_mode == 0) {
        Vec3 ud = d.normalized();
        double tt = 0.5 * (ud.y + 1.0);
        Vec3 bot = {s.bg_bottom[0], s.bg_bottom[1], s.bg_bottom[2]};
        Vec3 top = {s.bg_top[0], s.bg_top[1], s.bg_top[2]};
        bg = bot * (1.0 - tt) + top * tt;
      } else {
        bg = {s.bg_bottom[0], s.bg_bottom[1], s.bg_bottom[2]};
      }
      radiance = radiance + throughput * bg;
      break;
    }

    Vec3 p = o + d * best.t;
    Vec3 outward;
    double u = 0, v = 0;
    int mat;
    bool front;
    if (best.fam == 0) {
      int i = best.idx;
      double f = (time - s.sphere_t0[i]) * s.sphere_inv_dt[i];
      Vec3 center = load3(s.sphere_c0, i) + load3(s.sphere_dc, i) * f;
      double r = s.sphere_radius[i];
      outward = (p - center) * (1.0 / r);
      Vec3 unit_out = (p - center) * (1.0 / std::fabs(r));
      double theta =
          std::acos(std::fmin(std::fmax(-unit_out.y, -1.0), 1.0));
      double phi = std::atan2(-unit_out.z, unit_out.x) + M_PI;
      u = phi / (2 * M_PI);
      v = theta / M_PI;
      mat = s.sphere_mat[i];
      front = d.dot(outward) < 0.0;
    } else if (best.fam == 1) {
      int i = best.idx;
      Vec3 qu = load3(s.quad_u, i), qv = load3(s.quad_v, i);
      Vec3 n = qu.cross(qv);
      outward = n.normalized();
      Vec3 w = n * (1.0 / n.dot(n));
      Vec3 pq = p - load3(s.quad_q, i);
      u = w.dot(pq.cross(qv));
      v = w.dot(qu.cross(pq));
      mat = s.quad_mat[i];
      front = d.dot(outward) < 0.0;
    } else {
      outward = {1, 0, 0};
      mat = s.med_mat[best.idx];
      front = true;
    }
    Vec3 normal = front ? outward : outward * -1.0;

    int mtype = s.mat_type[mat];
    Vec3 albedo = texture(s, s.mat_tex[mat], u, v, p);

    if (mtype == kMatLight) {
      radiance = radiance + throughput * albedo;
      break;
    }
    if (bounce >= max_depth) break;  // hit at max depth -> black

    size_t di = ((size_t)bounce * n_rays + ray_idx) * 3;
    Vec3 unit_rand = {draws_unit[di], draws_unit[di + 1],
                      draws_unit[di + 2]};
    Vec3 sphere_rand = {draws_sphere[di], draws_sphere[di + 1],
                        draws_sphere[di + 2]};
    double u_choice = draws_choice[(size_t)bounce * n_rays + ray_idx];

    Vec3 new_d, atten;
    if (mtype == kMatLambertian) {
      new_d = normal + unit_rand;
      if (std::fabs(new_d.x) < 1e-8 && std::fabs(new_d.y) < 1e-8 &&
          std::fabs(new_d.z) < 1e-8)
        new_d = normal;
      atten = albedo;
    } else if (mtype == kMatMetal) {
      Vec3 unit_d = d.normalized();
      new_d = reflect(unit_d, normal) + sphere_rand * s.mat_fuzz[mat];
      if (new_d.dot(normal) <= 0.0) break;  // absorbed
      atten = albedo;
    } else if (mtype == kMatDielectric) {
      double ior = s.mat_ior[mat];
      double ratio = front ? 1.0 / ior : ior;
      Vec3 unit_d = d.normalized();
      double cos_theta = std::fmin(-unit_d.dot(normal), 1.0);
      double sin_theta =
          std::sqrt(std::fmax(1.0 - cos_theta * cos_theta, 0.0));
      if (ratio * sin_theta > 1.0 ||
          schlick(cos_theta, ratio) > u_choice) {
        new_d = reflect(unit_d, normal);
      } else {
        new_d = refract(unit_d, normal, ratio);
      }
      atten = {1, 1, 1};
    } else {  // isotropic
      new_d = sphere_rand;
      atten = albedo;
    }
    throughput = throughput * atten;
    o = p;
    d = new_d;
  }
  out_radiance[0] = (float)radiance.x;
  out_radiance[1] = (float)radiance.y;
  out_radiance[2] = (float)radiance.z;
}

// Batch entry: trace rays [0, n_rays).
void rrt_golden_trace(const GoldenScene* s, const float* o,  // (N,3)
                      const float* d,                        // (N,3)
                      const float* time,                     // (N,)
                      int n_rays, int max_depth, float t_min,
                      const float* draws_unit, const float* draws_sphere,
                      const float* draws_choice, const float* draws_medium,
                      int med_stride, float* out) {  // (N,3)
  for (int i = 0; i < n_rays; ++i) {
    rrt_golden_trace_ray(s, o + 3 * i, d + 3 * i, time[i], i, n_rays,
                         max_depth, t_min, draws_unit, draws_sphere,
                         draws_choice, draws_medium, med_stride,
                         out + 3 * i);
  }
}

}  // extern "C"
