// Single-linkage BFS labelling for cluster mode.
//
// Identical semantics to the reference's serial clustering pass
// (/root/reference/src/cluster.cc:279-417): walk seeds in input
// order, label every reachable member via the precomputed adjacency
// (CSR, neighbour order = the reference's network order), linking
// members into an intrusive next-chain in discovery order. The Python
// loop in modes/cluster.py is the executable specification; this is
// the same algorithm at native speed for multi-million-sequence runs.

#include <cstdint>

extern "C" {

// adj_start: [n+1] CSR offsets into dst; dst: neighbour indices.
// Outputs (caller-allocated): clusterid[n] (-1-initialised), nxt[n]
// (-1-initialised), seeds[n], sizes[n]. Returns the cluster count.
int64_t cluster_bfs(int64_t n, const int64_t* adj_start,
                    const int64_t* dst, int64_t* clusterid,
                    int64_t* nxt, int64_t* seeds, int64_t* sizes) {
    const int64_t NO = -1;
    int64_t nclusters = 0;
    for (int64_t seed = 0; seed < n; seed++) {
        if (clusterid[seed] != NO) continue;
        int64_t cid = nclusters;
        clusterid[seed] = cid;
        int64_t tail = seed;
        int64_t size = 0;
        for (int64_t member = seed; member != NO; member = nxt[member]) {
            size++;
            for (int64_t e = adj_start[member]; e < adj_start[member + 1];
                 e++) {
                int64_t hit = dst[e];
                if (clusterid[hit] == NO) {
                    clusterid[hit] = cid;
                    nxt[tail] = hit;
                    tail = hit;
                }
            }
        }
        seeds[nclusters] = seed;
        sizes[nclusters] = size;
        nclusters++;
    }
    return nclusters;
}

}  // extern "C"
