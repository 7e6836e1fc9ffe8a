// Z-buffered point-sprite rasteriser — capability parity with the
// reference's render_balls_so.cpp (tf_ops/CD/render_balls_so.cpp:14-58):
// splat each 3D point as a screen-space ball with per-pixel depth test.
//
// C ABI: render_ball(h, w, show(h*w*3 uint8), n, xyzs(n*3 int32, pre-scaled
// screen coords+depth), c0,c1,c2 (n int32 per-channel colors), radius)

#include <algorithm>
#include <cstring>
#include <vector>

extern "C" void render_ball(
    int h, int w, unsigned char* show, int n, const int* xyzs,
    const int* c0, const int* c1, const int* c2, int r) {
  r = std::max(r, 1);
  std::vector<int> depth(h * w, -2100000000);
  std::vector<int> pattern;  // disc offsets
  for (int dx = -r; dx <= r; ++dx)
    for (int dy = -r; dy <= r; ++dy)
      if (dx * dx + dy * dy < r * r) {
        pattern.push_back(dx);
        pattern.push_back(dy);
      }
  for (int i = 0; i < n; ++i) {
    int x = xyzs[i * 3 + 0];
    int y = xyzs[i * 3 + 1];
    int z = xyzs[i * 3 + 2];
    for (size_t p = 0; p < pattern.size(); p += 2) {
      int px = x + pattern[p];
      int py = y + pattern[p + 1];
      if (px < 0 || px >= h || py < 0 || py >= w) continue;
      int* d = &depth[px * w + py];
      if (z > *d) {
        *d = z;
        unsigned char* pix = show + (px * w + py) * 3;
        pix[0] = (unsigned char)std::clamp(c0[i], 0, 255);
        pix[1] = (unsigned char)std::clamp(c1[i], 0, 255);
        pix[2] = (unsigned char)std::clamp(c2[i], 0, 255);
      }
    }
  }
}
