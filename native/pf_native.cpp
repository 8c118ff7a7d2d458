// pf_native — C++ host-runtime kernels for permafrost_engine_tpu.
//
// The reference implements its whole runtime in C; here the TPU owns the
// simulation, and the host-side hot paths that remain are (a) parsing
// large ASCII assets at load time (a 16x16-chunk PFMAP is ~260k tile
// records) and (b) portal-graph A* at command rate with many concurrent
// path requests (ref: src/navigation/a_star.c). Both are implemented here
// with plain C ABI for ctypes binding — no Python allocation inside.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// PFMAP tile-record parsing (ref format: docs/pfmap.txt section 3.3)
//
// Records are exactly 24 chars, whitespace-delimited. Output arrays must be
// preallocated with n_tiles elements. Returns the number of tiles parsed
// (== n_tiles on success), or -1 on a malformed record.
// ---------------------------------------------------------------------------

static inline int hexval(char c) {
    if (c >= '0' && c <= '9') return c - '0';
    if (c >= 'a' && c <= 'f') return c - 'a' + 10;
    if (c >= 'A' && c <= 'F') return c - 'A' + 10;
    return -1;
}

int64_t parse_pfmap_tiles(
    const char *text, int64_t text_len, int64_t n_tiles,
    uint8_t *tile_type, int8_t *base_height, uint8_t *ramp_height,
    int16_t *top_mat, int16_t *side_mat, uint8_t *pathable,
    uint8_t *blend_normals, uint8_t *no_bump, uint8_t *cover,
    uint8_t *edge_blend /* n_tiles * 4 */) {
    const char *p = text;
    const char *end = text + text_len;
    int64_t i = 0;
    while (i < n_tiles) {
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r'))
            p++;
        if (end - p < 24) return -1;
        const char *t = p;
        int tt = hexval(t[0]);
        if (tt < 0) return -1;
        tile_type[i] = (uint8_t)tt;
        int sign = (t[1] == '-') ? -1 : 1;
        base_height[i] = (int8_t)(sign * ((t[2] - '0') * 10 + (t[3] - '0')));
        ramp_height[i] = (uint8_t)((t[4] - '0') * 10 + (t[5] - '0'));
        top_mat[i] = (int16_t)((t[6] - '0') * 100 + (t[7] - '0') * 10 + (t[8] - '0'));
        side_mat[i] = (int16_t)((t[9] - '0') * 100 + (t[10] - '0') * 10 + (t[11] - '0'));
        pathable[i] = (uint8_t)(t[12] == '1');
        blend_normals[i] = (uint8_t)(t[14] == '1');
        no_bump[i] = (uint8_t)(t[15] == '1');
        cover[i] = (uint8_t)(t[16] - '0');
        for (int k = 0; k < 4; k++)
            edge_blend[i * 4 + k] = (uint8_t)(t[17 + k] - '0');
        p += 24;
        i++;
    }
    return i;
}

// ---------------------------------------------------------------------------
// Portal-graph A* (ref: src/navigation/a_star.c:429 AStar_PortalGraphPath)
//
// Graph in CSR form: adj_off[n_nodes+1], adj_dst[...], adj_cost[...].
// Virtual start: (start_ids, start_costs, n_start). Virtual goal:
// (goal_ids, goal_costs, n_goal). Heuristic: octile distance over node
// (row, col) coordinates toward goal_rc.
//
// Writes the node path into out_path (capacity out_cap) and returns its
// length, or -1 if unreachable / capacity exceeded.
// ---------------------------------------------------------------------------

int64_t astar_portals(
    int64_t n_nodes,
    const int64_t *adj_off, const int64_t *adj_dst, const float *adj_cost,
    const float *node_r, const float *node_c,
    const int64_t *start_ids, const float *start_costs, int64_t n_start,
    const int64_t *goal_ids, const float *goal_costs, int64_t n_goal,
    float goal_r, float goal_c,
    int64_t *out_path, int64_t out_cap) {

    const float INF = 1e30f;
    const float SQRT2_M1 = 0.41421356f;
    std::vector<float> best(n_nodes, INF);
    std::vector<int64_t> came(n_nodes, -2);   // -2 = unvisited, -1 = start
    std::vector<float> goal_cost(n_nodes, INF);
    for (int64_t k = 0; k < n_goal; k++) goal_cost[goal_ids[k]] = goal_costs[k];

    auto heur = [&](int64_t n) {
        float dr = fabsf(node_r[n] - goal_r);
        float dc = fabsf(node_c[n] - goal_c);
        return (dr > dc) ? dr + SQRT2_M1 * dc : dc + SQRT2_M1 * dr;
    };

    // queue entries carry (f, g, node): recovering g as f - heur(n) is
    // numerically fragile in float32 and can mis-flag entries as stale
    struct QE { float f; float g; int64_t n; };
    struct Cmp { bool operator()(const QE &a, const QE &b) const {
        return a.f > b.f; } };
    std::priority_queue<QE, std::vector<QE>, Cmp> pq;
    for (int64_t k = 0; k < n_start; k++) {
        int64_t s = start_ids[k];
        if (start_costs[k] < best[s]) {
            best[s] = start_costs[k];
            came[s] = -1;
            pq.push({start_costs[k] + heur(s), start_costs[k], s});
        }
    }

    float goal_best = INF;
    int64_t goal_from = -1;
    while (!pq.empty()) {
        QE top = pq.top(); pq.pop();
        if (top.f >= goal_best) break;
        int64_t n = top.n;
        float g = top.g;
        if (g > best[n]) continue;   // stale entry
        if (goal_cost[n] < INF && g + goal_cost[n] < goal_best) {
            goal_best = g + goal_cost[n];
            goal_from = n;
        }
        for (int64_t e = adj_off[n]; e < adj_off[n + 1]; e++) {
            int64_t m = adj_dst[e];
            float ng = g + adj_cost[e];
            if (ng < best[m]) {
                best[m] = ng;
                came[m] = n;
                pq.push({ng + heur(m), ng, m});
            }
        }
    }
    if (goal_from < 0) return -1;

    // walk back
    int64_t len = 0;
    for (int64_t n = goal_from; n != -1; n = came[n]) {
        if (len >= out_cap || n < -1) return -1;
        out_path[len++] = n;
    }
    // reverse in place
    for (int64_t a = 0, b = len - 1; a < b; a++, b--) {
        int64_t tmp = out_path[a]; out_path[a] = out_path[b]; out_path[b] = tmp;
    }
    return len;
}

// ---------------------------------------------------------------------------
// Grid Dijkstra (exact, serial) — host oracle / fallback for field builds
// when the device is saturated; also used by tools. cost: u8[h*w] with 255
// impassable; seeds: indices. Writes f32 distances (octile metric,
// no corner cutting — matches ops/flowfield.py).
// ---------------------------------------------------------------------------

void grid_dijkstra(
    const uint8_t *cost, int64_t h, int64_t w,
    const int64_t *seeds, int64_t n_seeds, float *dist_out) {

    const float INF = 1e30f;
    const float SQRT2 = 1.41421356f;
    int64_t n = h * w;
    for (int64_t i = 0; i < n; i++) dist_out[i] = INF;

    typedef std::pair<float, int64_t> QE;
    std::priority_queue<QE, std::vector<QE>, std::greater<QE>> pq;
    for (int64_t k = 0; k < n_seeds; k++) {
        int64_t s = seeds[k];
        if (cost[s] != 255) { dist_out[s] = 0.f; pq.push({0.f, s}); }
    }
    const int dr[8] = {-1, -1, -1, 0, 0, 1, 1, 1};
    const int dc[8] = {-1, 0, 1, -1, 1, -1, 0, 1};
    while (!pq.empty()) {
        QE top = pq.top(); pq.pop();
        float d = top.first;
        int64_t idx = top.second;
        if (d > dist_out[idx]) continue;
        int64_t r = idx / w, c = idx % w;
        for (int k = 0; k < 8; k++) {
            int64_t nr = r + dr[k], nc = c + dc[k];
            if (nr < 0 || nr >= h || nc < 0 || nc >= w) continue;
            int64_t nidx = nr * w + nc;
            if (cost[nidx] == 255) continue;
            if (dr[k] != 0 && dc[k] != 0) {
                if (cost[r * w + nc] == 255 || cost[nr * w + c] == 255) continue;
            }
            float step = (float)cost[nidx] * ((dr[k] && dc[k]) ? SQRT2 : 1.f);
            float nd = d + step;
            if (nd < dist_out[nidx] - 1e-6f) {
                dist_out[nidx] = nd;
                pq.push({nd, nidx});
            }
        }
    }
}

}  // extern "C"
