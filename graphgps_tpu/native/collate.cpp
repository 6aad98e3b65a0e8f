// Native batch collater: packs graphs from a contiguous dataset arena into
// fixed-shape padded batch buffers, with a stable counting sort of edges by
// receiver (CSR order for the TPU segment kernels).
//
// This is the host-side hot path of the data loader — the capability the
// reference gets from PyG's C++ collate + torch DataLoader workers
// (/root/reference/main.py:142 via GraphGym create_loader). Exposed as a C ABI
// for ctypes; the Python fallback lives in graphgps_tpu/data/batching.py.
//
// Build: g++ -O3 -march=native -shared -fPIC collate.cpp -o libggps_collate.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Returns 0 on success; -1 node overflow; -2 edge overflow.
// Feature rows are copied as raw bytes (nf_row / ef_row bytes per row).
// Padded edge lanes carry receiver = last real receiver (keeps the receiver
// array non-decreasing so XLA's sorted-segment hint stays valid) and mask 0.
int collate_batch(
    const int64_t* node_off,       // (G+1,) arena node row offsets
    const int64_t* edge_off,       // (G+1,) arena edge row offsets
    const uint8_t* node_feat,      // packed node rows
    const uint8_t* edge_feat,      // packed edge rows (may be NULL)
    const int32_t* senders_all,    // (sumE,) graph-local sender ids
    const int32_t* receivers_all,  // (sumE,) graph-local receiver ids
    const int64_t* sel,            // (B_sel,) graph indices for this batch
    int64_t B_sel,
    int64_t B, int64_t Nmax, int64_t Emax,
    int64_t nf_row, int64_t ef_row,
    uint8_t* out_node_feat,        // (B*Nmax * nf_row) bytes
    uint8_t* out_edge_feat,        // (Emax * ef_row) bytes (may be NULL)
    int32_t* out_senders,          // (Emax,)
    int32_t* out_receivers,        // (Emax,)
    uint8_t* out_node_mask,        // (B*Nmax,)
    uint8_t* out_edge_mask,        // (Emax,)
    uint8_t* out_graph_mask)       // (B,)
{
    const int64_t S = B * Nmax;
    std::memset(out_node_feat, 0, static_cast<size_t>(S) * nf_row);
    if (ef_row && out_edge_feat)
        std::memset(out_edge_feat, 0, static_cast<size_t>(Emax) * ef_row);
    std::memset(out_node_mask, 0, S);
    std::memset(out_edge_mask, 0, Emax);
    std::memset(out_graph_mask, 0, B);

    std::vector<int32_t> s_tmp, r_tmp;
    std::vector<int64_t> e_src;
    s_tmp.reserve(Emax); r_tmp.reserve(Emax); e_src.reserve(Emax);

    for (int64_t i = 0; i < B_sel && i < B; ++i) {
        const int64_t g = sel[i];
        const int64_t n = node_off[g + 1] - node_off[g];
        const int64_t e = edge_off[g + 1] - edge_off[g];
        if (n > Nmax) return -1;
        if (static_cast<int64_t>(s_tmp.size()) + e > Emax) return -2;
        const int64_t base = i * Nmax;
        std::memcpy(out_node_feat + static_cast<size_t>(base) * nf_row,
                    node_feat + static_cast<size_t>(node_off[g]) * nf_row,
                    static_cast<size_t>(n) * nf_row);
        std::memset(out_node_mask + base, 1, n);
        out_graph_mask[i] = 1;
        const int32_t* sp = senders_all + edge_off[g];
        const int32_t* rp = receivers_all + edge_off[g];
        for (int64_t k = 0; k < e; ++k) {
            s_tmp.push_back(static_cast<int32_t>(sp[k] + base));
            r_tmp.push_back(static_cast<int32_t>(rp[k] + base));
            e_src.push_back(edge_off[g] + k);
        }
    }

    // stable counting sort by receiver
    const int64_t E = static_cast<int64_t>(s_tmp.size());
    std::vector<int32_t> cnt(S + 1, 0);
    for (int64_t k = 0; k < E; ++k) cnt[r_tmp[k] + 1]++;
    for (int64_t v = 0; v < S; ++v) cnt[v + 1] += cnt[v];
    int32_t last_recv = 0;
    for (int64_t k = 0; k < E; ++k) {
        const int64_t pos = cnt[r_tmp[k]]++;
        out_senders[pos] = s_tmp[k];
        out_receivers[pos] = r_tmp[k];
        out_edge_mask[pos] = 1;
        if (ef_row && out_edge_feat && edge_feat)
            std::memcpy(out_edge_feat + static_cast<size_t>(pos) * ef_row,
                        edge_feat + static_cast<size_t>(e_src[k]) * ef_row,
                        ef_row);
    }
    if (E > 0) last_recv = out_receivers[E - 1];
    for (int64_t k = E; k < Emax; ++k) {
        out_senders[k] = last_recv;   // self-edge on a masked lane
        out_receivers[k] = last_recv; // keeps receivers non-decreasing
    }
    return 0;
}

// Pad per-node float rows (PE tensors) into batch slot layout.
int pad_node_rows(
    const int64_t* node_off, const uint8_t* rows, const int64_t* sel,
    int64_t B_sel, int64_t B, int64_t Nmax, int64_t row_bytes,
    uint8_t* out)  // (B*Nmax * row_bytes)
{
    std::memset(out, 0, static_cast<size_t>(B) * Nmax * row_bytes);
    for (int64_t i = 0; i < B_sel && i < B; ++i) {
        const int64_t g = sel[i];
        const int64_t n = node_off[g + 1] - node_off[g];
        if (n > Nmax) return -1;
        std::memcpy(out + static_cast<size_t>(i) * Nmax * row_bytes,
                    rows + static_cast<size_t>(node_off[g]) * row_bytes,
                    static_cast<size_t>(n) * row_bytes);
    }
    return 0;
}

}  // extern "C"
