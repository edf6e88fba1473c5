// 0-dimensional persistent homology of a superlevel filtration (elder rule).
//
// Native core of the topological loss (unet_torch_tpu/losses/topo.py): the
// union-find sweep over pixels sorted by descending value is inherently
// sequential and dominates the host side of the loss; this C++ version
// replaces an O(n log n + n α(n)) pure-Python loop with the same algorithm at
// C speed.  Compiled lazily by native/build.py via g++ into ph0.so and loaded
// through ctypes (no pybind11 in this image).
//
// Returns bars sorted by persistence (descending), truncated to max_bars:
//   births[i], deaths[i] = flat pixel indices of the birth/death critical
//   pixels.  The essential bar (last surviving component) dies at the global
//   minimum pixel.

#include <algorithm>
#include <cstdint>
#include <vector>

namespace {

struct UnionFind {
  std::vector<int64_t> parent;
  explicit UnionFind(int64_t n) : parent(n, -1) {}
  int64_t find(int64_t x) {
    int64_t root = x;
    while (parent[root] != root) root = parent[root];
    while (parent[x] != root) {
      int64_t next = parent[x];
      parent[x] = root;
      x = next;
    }
    return root;
  }
};

}  // namespace

extern "C" {

// img: h*w floats; births/deaths: caller-allocated int32[max_bars].
// Returns the number of bars written (<= max_bars).
int superlevel_ph0(const float* img, int h, int w, int max_bars,
                   int32_t* births, int32_t* deaths) {
  const int64_t n = static_cast<int64_t>(h) * w;
  std::vector<int64_t> order(n);
  for (int64_t i = 0; i < n; ++i) order[i] = i;
  std::stable_sort(order.begin(), order.end(),
                   [&](int64_t a, int64_t b) { return img[a] > img[b]; });

  UnionFind uf(n);
  std::vector<int64_t> birth_of(n, 0);
  std::vector<int64_t> bar_birth, bar_death;
  bar_birth.reserve(1024);
  bar_death.reserve(1024);

  static const int dy[8] = {-1, -1, -1, 0, 0, 1, 1, 1};
  static const int dx[8] = {-1, 0, 1, -1, 1, -1, 0, 1};

  for (int64_t oi = 0; oi < n; ++oi) {
    const int64_t px = order[oi];
    uf.parent[px] = px;
    birth_of[px] = px;
    const int y = static_cast<int>(px / w);
    const int x = static_cast<int>(px % w);
    for (int d = 0; d < 8; ++d) {
      const int ny = y + dy[d];
      const int nx = x + dx[d];
      if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
      const int64_t np = static_cast<int64_t>(ny) * w + nx;
      if (uf.parent[np] == -1) continue;
      int64_t ra = uf.find(px);
      int64_t rb = uf.find(np);
      if (ra == rb) continue;
      // elder rule: the component with the lower birth value dies
      int64_t young, old;
      if (img[birth_of[ra]] <= img[birth_of[rb]]) {
        young = ra;
        old = rb;
      } else {
        young = rb;
        old = ra;
      }
      bar_birth.push_back(birth_of[young]);
      bar_death.push_back(px);
      uf.parent[young] = old;
    }
  }
  if (n > 0) {
    const int64_t root = uf.find(order[0]);
    bar_birth.push_back(birth_of[root]);
    bar_death.push_back(order[n - 1]);
  }

  const int64_t nbars = static_cast<int64_t>(bar_birth.size());
  std::vector<int64_t> idx(nbars);
  for (int64_t i = 0; i < nbars; ++i) idx[i] = i;
  std::stable_sort(idx.begin(), idx.end(), [&](int64_t a, int64_t b) {
    const float pa = img[bar_birth[a]] - img[bar_death[a]];
    const float pb = img[bar_birth[b]] - img[bar_death[b]];
    return pa > pb;
  });

  const int out_n = static_cast<int>(std::min<int64_t>(nbars, max_bars));
  for (int i = 0; i < out_n; ++i) {
    births[i] = static_cast<int32_t>(bar_birth[idx[i]]);
    deaths[i] = static_cast<int32_t>(bar_death[idx[i]]);
  }
  return out_n;
}

// Connected components of a uint8 mask (8-connectivity) — count only.
int count_components(const uint8_t* mask, int h, int w) {
  const int64_t n = static_cast<int64_t>(h) * w;
  UnionFind uf(n);
  for (int64_t i = 0; i < n; ++i)
    if (mask[i]) uf.parent[i] = i;
  static const int dy[4] = {0, 1, 1, 1};
  static const int dx[4] = {1, -1, 0, 1};
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      const int64_t p = static_cast<int64_t>(y) * w + x;
      if (!mask[p]) continue;
      for (int d = 0; d < 4; ++d) {
        const int ny = y + dy[d];
        const int nx = x + dx[d];
        if (ny < 0 || ny >= h || nx < 0 || nx >= w) continue;
        const int64_t q = static_cast<int64_t>(ny) * w + nx;
        if (!mask[q]) continue;
        const int64_t ra = uf.find(p);
        const int64_t rb = uf.find(q);
        if (ra != rb) uf.parent[ra] = rb;
      }
    }
  }
  int count = 0;
  for (int64_t i = 0; i < n; ++i)
    if (mask[i] && uf.find(i) == i) ++count;
  return count;
}

}  // extern "C"
