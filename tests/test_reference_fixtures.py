"""Per-layer allclose against REFERENCE-EXTRACTED fixtures (SURVEY §7.3.4).

tests/fixtures/reference_fixtures.npz holds {inputs, state_dict, outputs}
captured by executing the actual reference layer code
(tools/extract_reference_fixtures.py runs /root/reference/graphgps/layer/*
on CPU torch under minimal PyG stubs). Here the reference weights are loaded
into this framework's flax modules and outputs compared — upgrading the
numpy-derived oracles (tests/test_layer_oracles.py) to reference-extracted
oracles (VERDICT r2 next #7)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgps_tpu.data.graph import GraphBatch

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures",
                   "reference_fixtures.npz")


@pytest.fixture(scope="module")
def fixtures():
    z = np.load(FIX, allow_pickle=True)
    return {k: z[k].item() for k in z.files}


def _t(w):
    return jnp.asarray(np.asarray(w).T)


def _single_graph_batch(case, pe_key=None):
    """Exact one-graph GraphBatch (no padding) from a fixture record."""
    x = case["x"]
    ei = case["edge_index"]
    n, m = x.shape[0], ei.shape[1]
    e = case.get("e")
    pe = {}
    if pe_key is not None:
        pe[pe_key] = jnp.asarray(case["pe"])
    return GraphBatch(
        node_feat=jnp.asarray(x), edge_feat=None if e is None else jnp.asarray(e),
        senders=jnp.asarray(ei[0], jnp.int32),
        receivers=jnp.asarray(ei[1], jnp.int32),
        node_mask=jnp.ones(n, bool), edge_mask=jnp.ones(m, bool),
        graph_mask=jnp.ones(1, bool), y=None, pe=pe, extras={},
        num_graphs=1, max_nodes=n)


def _dense(state, prefix):
    return {"kernel": _t(state[f"{prefix}.weight"]),
            "bias": jnp.asarray(state[f"{prefix}.bias"])}


def _bn(state, prefix):
    params = {"scale": jnp.asarray(state[f"{prefix}.weight"]),
              "bias": jnp.asarray(state[f"{prefix}.bias"])}
    stats = {"mean": jnp.asarray(state[f"{prefix}.running_mean"]),
             "var": jnp.asarray(state[f"{prefix}.running_var"])}
    return params, stats


@pytest.mark.parametrize("case_name,es", [("gatedgcn", False),
                                          ("gatedgcn_es", True)])
def test_gatedgcn_matches_reference(fixtures, case_name, es):
    from graphgps_tpu.models.local_gnn import GatedGCNLayer

    case = fixtures[case_name]
    st = case["state"]
    gb = _single_graph_batch(case, pe_key="pe_EquivStableLapPE" if es else None)
    layer = GatedGCNLayer(dim=16, dropout=0.0, residual=True,
                          equivstable_pe=es, batch_norm=True)

    bnx_p, bnx_s = _bn(st, "bn_node_x")
    bne_p, bne_s = _bn(st, "bn_edge_e")
    params = {
        "Dense_0": _dense(st, "A"), "Dense_1": _dense(st, "B"),
        "Dense_2": _dense(st, "C"), "Dense_3": _dense(st, "D"),
        "Dense_4": _dense(st, "E"),
        "Norm_0": {"MaskedBatchNorm_0": bnx_p},
        "Norm_1": {"MaskedBatchNorm_0": bne_p},
    }
    if es:
        params["MLP_0"] = {"Dense_0": _dense(st, "mlp_r_ij.0"),
                           "Dense_1": _dense(st, "mlp_r_ij.2")}
    batch_stats = {"Norm_0": {"MaskedBatchNorm_0": bnx_s},
                   "Norm_1": {"MaskedBatchNorm_0": bne_s}}
    x_out, e_out = layer.apply(
        {"params": params, "batch_stats": batch_stats},
        gb, jnp.asarray(case["x"]), jnp.asarray(case["e"]), False)
    np.testing.assert_allclose(np.asarray(x_out), case["out_x"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(e_out), case["out_e"],
                               rtol=1e-4, atol=1e-5)


def test_gine_eslappe_matches_reference(fixtures):
    from graphgps_tpu.models.local_gnn import GINELayer

    case = fixtures["gine_es"]
    st = case["state"]
    gb = _single_graph_batch(case, pe_key="pe_EquivStableLapPE")
    layer = GINELayer(dim=16, equivstable_pe=True, wrap_norm_act=False)
    params = {
        "eps": jnp.asarray(st["eps"]).reshape(()),
        "MLP_0": {"Dense_0": _dense(st, "mlp_r_ij.0"),
                  "Dense_1": _dense(st, "mlp_r_ij.2")},
        "MLP_1": {"Dense_0": _dense(st, "nn.0"),
                  "Dense_1": _dense(st, "nn.2")},
    }
    x_out, _ = layer.apply({"params": params}, gb, jnp.asarray(case["x"]),
                           jnp.asarray(case["e"]), False)
    np.testing.assert_allclose(np.asarray(x_out), case["out_x"],
                               rtol=1e-4, atol=1e-5)


def test_san_attention_matches_reference(fixtures):
    from graphgps_tpu.models.san import SANAttention

    case = fixtures["san_full"]
    st = case["state"]
    n1, n2 = case["graph_sizes"]
    d, H, Dh = 16, 2, 8
    nmax = int(max(n1, n2))
    # flat slot layout: graph g occupies slots [g*nmax, g*nmax + n_g)
    slot_of = np.concatenate([np.arange(n1),
                              nmax + np.arange(n2)]).astype(np.int32)
    x = np.zeros((2 * nmax, d), np.float32)
    x[slot_of] = case["x"]
    node_mask = np.zeros(2 * nmax, bool)
    node_mask[slot_of] = True
    ei = slot_of[case["edge_index"]]
    gb = GraphBatch(
        node_feat=jnp.asarray(x), edge_feat=jnp.asarray(case["e"]),
        senders=jnp.asarray(ei[0]), receivers=jnp.asarray(ei[1]),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.ones(ei.shape[1], bool),
        graph_mask=jnp.ones(2, bool), y=None, pe={}, extras={},
        num_graphs=2, max_nodes=nmax)

    def dgen(prefix):  # torch (H*Dh, in) → flax DenseGeneral (in, H, Dh)
        return {"kernel": _t(st[f"{prefix}.weight"]).reshape(d, H, Dh)}

    params = {"Q": dgen("Q"), "K": dgen("K"), "V": dgen("V"), "E": dgen("E"),
              "Q2": dgen("Q_2"), "K2": dgen("K_2"), "E2": dgen("E_2"),
              "fake_edge_emb": jnp.asarray(st["fake_edge_emb.weight"][0])}
    attn = SANAttention(out_dim=Dh, num_heads=H, gamma=0.1, full_graph=True)
    out = attn.apply({"params": params}, gb, jnp.asarray(x),
                     jnp.asarray(case["e"]), False)
    np.testing.assert_allclose(np.asarray(out)[slot_of], case["out_x"],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case_name,train", [("lappe_deepset", False),
                                             ("lappe_train_bn", True)])
def test_lappe_encoder_matches_reference(fixtures, case_name, train,
                                         monkeypatch):
    from graphgps_tpu.models.encoders import LapPENodeEncoder

    case = fixtures[case_name]
    st = case["state"]
    n, K, d_pe = case["evecs"].shape[0], 4, 6
    gb = GraphBatch(
        node_feat=jnp.asarray(case["x"]), edge_feat=None,
        senders=jnp.zeros(1, jnp.int32), receivers=jnp.zeros(1, jnp.int32),
        node_mask=jnp.ones(n, bool), edge_mask=jnp.zeros(1, bool),
        graph_mask=jnp.ones(1, bool), y=None,
        pe={"EigVecs": jnp.asarray(case["evecs"])},
        extras={"EigVals": jnp.asarray(case["evals"]).reshape(1, 1, K)},
        num_graphs=1, max_nodes=n)
    if train:
        # pin the sign flip to +1, mirroring the extractor's torch.rand patch
        monkeypatch.setattr(jax.random, "bernoulli",
                            lambda key, p=0.5, shape=(): jnp.ones(shape, bool))
    bn_p, bn_s = _bn(st, "raw_norm")
    params = {
        "MaskedBatchNorm_0": bn_p,
        "Dense_0": _dense(st, "linear_A"),          # 2 → 2*dim_pe
        "Dense_1": _dense(st, "pe_encoder.1"),      # 12 → 12
        "Dense_2": _dense(st, "pe_encoder.3"),      # 12 → 6
        "MLP_0": {"Dense_0": _dense(st, "post_mlp.0"),
                  "Dense_1": _dense(st, "post_mlp.2")},
    }
    enc = LapPENodeEncoder(dim_pe=d_pe, model="DeepSet", layers=3,
                           post_layers=2, max_freqs=K,
                           raw_norm_type="BatchNorm")
    out = enc.apply({"params": params, "batch_stats": {
                        "MaskedBatchNorm_0": bn_s}},
                    gb, None, train,
                    rngs={"signflip": jax.random.PRNGKey(0)},
                    mutable=["batch_stats"])[0]
    # reference output = [linear_x(x), pos_enc]; compare the PE columns
    np.testing.assert_allclose(np.asarray(out), case["out_x"][:, 16 - d_pe:],
                               rtol=1e-4, atol=1e-5)


def _two_graph_batch(case, d=16):
    n1, n2 = case["graph_sizes"]
    nmax = int(max(n1, n2))
    slot_of = np.concatenate([np.arange(n1),
                              nmax + np.arange(n2)]).astype(np.int32)
    x = np.zeros((2 * nmax, d), np.float32)
    x[slot_of] = case["x"]
    node_mask = np.zeros(2 * nmax, bool)
    node_mask[slot_of] = True
    e = case.get("e")
    ei = (slot_of[case["edge_index"]] if "edge_index" in case
          else np.zeros((2, 1), np.int32))
    gb = GraphBatch(
        node_feat=jnp.asarray(x),
        edge_feat=None if e is None else jnp.asarray(e),
        senders=jnp.asarray(ei[0], jnp.int32),
        receivers=jnp.asarray(ei[1], jnp.int32),
        node_mask=jnp.asarray(node_mask),
        edge_mask=jnp.ones(ei.shape[1], bool) if "edge_index" in case
        else jnp.zeros(1, bool),
        graph_mask=jnp.ones(2, bool), y=None, pe={}, extras={},
        num_graphs=2, max_nodes=nmax)
    return gb, jnp.asarray(x), slot_of


def test_san_block_matches_reference(fixtures):
    """Full SANLayer block: attention + O + BatchNorm + FFN + BatchNorm
    (reference san_layer.py:123-216)."""
    from graphgps_tpu.models.san import SANLayer

    case = fixtures["san_block"]
    st = case["state"]
    d, H, Dh = 16, 2, 8
    gb, x, slot_of = _two_graph_batch(case)

    def dgen(prefix):
        return {"kernel": _t(st[f"attention.{prefix}.weight"])
                .reshape(d, H, Dh)}

    bn1_p, bn1_s = _bn(st, "batch_norm1_h")
    bn2_p, bn2_s = _bn(st, "batch_norm2_h")
    params = {
        "SANAttention_0": {
            "Q": dgen("Q"), "K": dgen("K"), "V": dgen("V"), "E": dgen("E"),
            "Q2": dgen("Q_2"), "K2": dgen("K_2"), "E2": dgen("E_2"),
            "fake_edge_emb": jnp.asarray(st["fake_edge_emb.weight"][0])},
        "Dense_0": _dense(st, "O_h"),
        "Dense_1": _dense(st, "FFN_h_layer1"),
        "Dense_2": _dense(st, "FFN_h_layer2"),
        "Norm_0": {"MaskedBatchNorm_0": bn1_p},
        "Norm_1": {"MaskedBatchNorm_0": bn2_p},
    }
    batch_stats = {"Norm_0": {"MaskedBatchNorm_0": bn1_s},
                   "Norm_1": {"MaskedBatchNorm_0": bn2_s}}
    layer = SANLayer(dim_h=d, num_heads=H, gamma=0.1, full_graph=True,
                     batch_norm=True, layer_norm=False, residual=True)
    out, _ = layer.apply({"params": params, "batch_stats": batch_stats},
                         gb, x, jnp.asarray(case["e"]), False)
    np.testing.assert_allclose(np.asarray(out)[slot_of], case["out_x"],
                               rtol=1e-4, atol=1e-5)


def test_graphormer_layer_matches_reference(fixtures):
    """Pre-LN biased MHA + pre-LN exact-GELU MLP
    (reference graphormer_layer.py:5-49); torch in_proj packing split into
    q/k/v kernels."""
    from graphgps_tpu.models.graphormer import GraphormerLayer

    case = fixtures["graphormer_layer"]
    st = case["state"]
    d, H = 16, 2
    gb, x, slot_of = _two_graph_batch(case)
    nmax = gb.max_nodes
    # reference bias is (B*H, Nmax, Nmax) for torch MHA; ours (B, H, N, N)
    bias = jnp.asarray(case["attn_bias"].reshape(2, H, nmax, nmax))
    gb = gb.replace(extras={"attn_bias": bias})

    w_in = np.asarray(st["attention.in_proj_weight"])   # (3d, d) [q; k; v]
    b_in = np.asarray(st["attention.in_proj_bias"])
    def proj(i):
        return {"kernel": jnp.asarray(w_in[i * d:(i + 1) * d].T),
                "bias": jnp.asarray(b_in[i * d:(i + 1) * d])}

    def ln(prefix):
        return {"scale": jnp.asarray(st[f"{prefix}.weight"]),
                "bias": jnp.asarray(st[f"{prefix}.bias"])}

    params = {
        "LayerNorm_0": ln("input_norm"),
        "Dense_0": proj(0), "Dense_1": proj(1), "Dense_2": proj(2),
        "Dense_3": _dense(st, "attention.out_proj"),
        "LayerNorm_1": ln("mlp.0"),
        "Dense_4": _dense(st, "mlp.1"),
        "Dense_5": _dense(st, "mlp.4"),
    }
    layer = GraphormerLayer(dim_h=d, num_heads=H)
    out, _ = layer.apply({"params": params}, gb, x, None, False)
    np.testing.assert_allclose(np.asarray(out)[slot_of], case["out_x"],
                               rtol=1e-4, atol=1e-5)
