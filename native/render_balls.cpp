// Z-buffered sphere-sprite rasteriser — capability parity with the
// reference's render_balls_so.cpp (tf_ops/CD/render_balls_so.cpp:14-58):
// each 3D point splats as a shaded sphere. Per pixel of the disc, the
// sphere surface height dz = sqrt(r² − dx² − dy²) offsets the depth test
// (so overlapping balls intersect like spheres, not discs) and scales the
// colour by dz/r; a global depth-range intensity term
// min(1, (z − zmin)/(zmax − zmin)·0.7 + 0.3) darkens far points
// (`render_balls_so.cpp:18-29,49-52`). Channel order here is straight
// RGB (the reference swizzles BGR via floats; this ABI keeps int32
// per-channel colours and natural order).
//
// C ABI: render_ball(h, w, show(h*w*3 uint8), n, xyzs(n*3 int32, pre-scaled
// screen coords+depth), c0,c1,c2 (n int32 per-channel colors), radius)

#include <algorithm>
#include <cmath>
#include <cstring>
#include <vector>

namespace {
struct Sprite {
  int dx, dy, dz;
  float shade;  // dz/r — sphere-surface lambertian-ish falloff
};
}  // namespace

extern "C" void render_ball(
    int h, int w, unsigned char* show, int n, const int* xyzs,
    const int* c0, const int* c1, const int* c2, int r) {
  r = std::max(r, 1);
  std::vector<int> depth(h * w, -2100000000);
  std::vector<Sprite> pattern;
  for (int dx = -r; dx <= r; ++dx)
    for (int dy = -r; dy <= r; ++dy)
      if (dx * dx + dy * dy < r * r) {
        double dz = std::sqrt(double(r * r - dx * dx - dy * dy));
        pattern.push_back({dx, dy, int(dz), float(dz / r)});
      }
  if (n <= 0) return;
  double zmin = xyzs[2] - r, zmax = xyzs[2] + r;
  for (int i = 1; i < n; ++i) {
    zmin = std::min(zmin, double(xyzs[i * 3 + 2] - r));
    zmax = std::max(zmax, double(xyzs[i * 3 + 2] + r));
  }
  double zrange = std::max(zmax - zmin, 1e-9);
  for (int i = 0; i < n; ++i) {
    int x = xyzs[i * 3 + 0];
    int y = xyzs[i * 3 + 1];
    int z = xyzs[i * 3 + 2];
    for (const Sprite& s : pattern) {
      int px = x + s.dx;
      int py = y + s.dy;
      int pz = z + s.dz;
      if (px < 0 || px >= h || py < 0 || py >= w) continue;
      int* d = &depth[px * w + py];
      if (pz > *d) {
        *d = pz;
        double intensity = std::min(1.0, (pz - zmin) / zrange * 0.7 + 0.3);
        double k = s.shade * intensity;
        unsigned char* pix = show + (px * w + py) * 3;
        pix[0] = (unsigned char)std::clamp(int(c0[i] * k), 0, 255);
        pix[1] = (unsigned char)std::clamp(int(c1[i] * k), 0, 255);
        pix[2] = (unsigned char)std::clamp(int(c2[i] * k), 0, 255);
      }
    }
  }
}
