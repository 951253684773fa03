"""Produce activation-parity golden bundles (this side of the
per-layer-activations-allclose north star, BASELINE.md).

Each bundle is one .npz containing (a) a tiny RAW graph (edge list +
bond types + atom codes — before any k-hop preprocessing, so each
framework runs its own prep pipeline), (b) this framework's initialized
parameters, and (c) the per-module activations captured on that graph.

The other half, tools/parity_reference_side.py, loads the reference
model (/root/reference a.k.a. JiaruiFeng/KP-GNN), copies these exact
parameters into its state_dict, preprocesses the same raw graph with
the reference's own extract_multi_hop_neighbors, and diffs every
hooked module output against the activations stored here.  It runs on
real torch_geometric when available and otherwise on tools/pyg_shim.py
— so the check executes end-to-end even inside this container.

One bundle per family/feature with reimplementation risk (VERDICT r3):
KPGIN spd (baseline), KPGCN (degree norm + analytic self-loop),
KPGraphSAGE (union-mean + L2-normalize), KPGINPlus (sliding window +
tanh peripheral gate + attention combine + virtual node), KPGINPrime
(GINE upper stack), KPGIN gd (graph-diffusion kernel), and KPGIN with
attention combine + JK-attention + virtual node + resistance distance.

Workflow (README "Cross-framework parity"):
    python -m kpgnn_tpu.scripts.make_parity_golden --all \
        --out_dir kpgnn_tpu/data/parity_golden
    python tools/parity_reference_side.py --reference /root/reference \
        --golden kpgnn_tpu/data/parity_golden/<name>.npz
"""
from __future__ import annotations

import argparse
import json
import os

import numpy as np

# shared vocab/shape arguments both sides rebuild exactly
BASE_ARGS = dict(
    hidden_size=16, num_layer=2, K=2,
    num_hop1_edge=3, max_pe_num=10, max_edge_type=2, max_edge_count=10,
    max_hop_num=3, max_distance_count=10, JK="last", combine="geometric",
    residual=False, norm_type="Batch", pooling_method="sum",
    output_size=2, input_size=21, kernel="spd", max_edge_attr_num=10,
    virtual_node=False, use_rd=False, aggr="add", num_l1_layer=1,
)

CONFIGS = {
    # the original round-3 bundle config (KPGIN spd baseline)
    "kpgin_spd": dict(model_name="KPGIN"),
    # degree norm + analytic self-loop (reference: layers/KPGCN.py:85-126)
    "kpgcn": dict(model_name="KPGCN"),
    # union-denominator mean + L2 normalize
    # (reference: layers/KPGraphSAGE.py:91-94)
    "kpsage": dict(model_name="KPGraphSAGE", aggr="mean"),
    # sliding window, tanh peripheral gate, attention combine, virtual
    # node, JK concat (reference: models/GNNs.py:238-474)
    "kpginplus": dict(model_name="KPGINPlus", num_layer=3,
                      combine="attention", JK="concat", residual=True,
                      virtual_node=True),
    # GINE upper stack (reference: models/GNNs.py:478-722)
    "kpginprime": dict(model_name="KPGINPrime", num_layer=3,
                       num_l1_layer=1),
    # graph-diffusion kernel: hop multiplicity, no SPD masking
    # (reference: data_utils.py:57-62)
    "kpgin_gd": dict(model_name="KPGIN", kernel="gd", K=3,
                     hidden_size=18),
    # attention combine + JK attention + virtual node + resistance
    # distance (reference: layers/combine.py:8-27, models/GNNs.py:66,
    # 72-73, 74-88)
    "kpgin_attn": dict(model_name="KPGIN", combine="attention",
                       JK="attention", virtual_node=True, use_rd=True),
}


def tiny_graph(seed: int = 7, input_size: int = 21):
    """Two fused rings + a tail: small, asymmetric, every hop populated."""
    rng = np.random.default_rng(seed)
    n = 11
    und = [(i, (i + 1) % 6) for i in range(6)]            # 6-ring
    und += [(5, 6), (6, 7), (7, 8), (8, 3)]               # fused 5-ring
    und += [(0, 9), (9, 10)]                              # tail
    e = np.array(und + [(v, u) for u, v in und]).T
    half = len(und)
    t = rng.integers(2, 5, size=half)                     # bond codes 2..4
    ea = np.concatenate([t, t])
    x = rng.integers(0, input_size, size=(n, 1))
    return n, e.astype(np.int64), ea.astype(np.int64), x.astype(np.int64)


def build_bundle(a: dict) -> dict:
    """All arrays of one golden bundle for a fully-resolved arg dict."""
    import jax
    import flax
    from kpgnn_tpu.graph.batch import collate
    from kpgnn_tpu.models import ModelConfig, make_model
    from kpgnn_tpu.prep import KHopConfig, extract_khop
    from kpgnn_tpu.utils.parity import capture_activations

    kcfg = KHopConfig(K=a["K"], kernel=a["kernel"],
                      max_edge_attr_num=a["max_edge_attr_num"],
                      max_hop_num=a["max_hop_num"],
                      max_edge_type=a["max_edge_type"],
                      max_edge_count=a["max_edge_count"],
                      max_distance_count=a["max_distance_count"],
                      use_rd=a["use_rd"])
    n, ei, ea, x = tiny_graph(input_size=a["input_size"])
    g = extract_khop(n, ei, ea, kcfg, x=x,
                     y=np.array([0], dtype=np.int64))
    batch = collate([g], n_pad=n + 1, e_pad=g.num_edges + 8, g_pad=2)

    mcfg = ModelConfig(
        model_name=a["model_name"], hidden_size=a["hidden_size"],
        num_layer=a["num_layer"], K=a["K"], kernel=a["kernel"],
        num_hop1_edge=a["num_hop1_edge"], max_pe_num=a["max_pe_num"],
        max_edge_type=a["max_edge_type"], max_edge_count=a["max_edge_count"],
        max_hop_num=a["max_hop_num"],
        max_distance_count=a["max_distance_count"], JK=a["JK"],
        combine=a["combine"], residual=a["residual"], aggr=a["aggr"],
        virtual_node=a["virtual_node"], use_rd=a["use_rd"],
        num_l1_layer=a["num_l1_layer"],
        input_encoder=("embedding", a["input_size"]),
        task="graph_classification", output_size=a["output_size"],
        pooling_method=a["pooling_method"], norm_type=a["norm_type"])
    model = make_model(mcfg)
    variables = model.init(jax.random.PRNGKey(0), batch, train=False)

    out = {"meta": np.frombuffer(
        json.dumps(a).encode(), dtype=np.uint8)}
    out["raw/n"] = np.array([n])
    out["raw/edge_index"] = ei
    out["raw/edge_attr"] = ea
    out["raw/x"] = x
    for coll in variables:
        flat = flax.traverse_util.flatten_dict(variables[coll])
        for k, v in flat.items():
            out[f"{coll}/" + "/".join(map(str, k))] = np.asarray(v)
    acts = capture_activations(model, variables, batch)
    for k, v in acts.items():
        out["act/" + k] = v
    pred = model.apply(variables, batch, train=False)
    out["act/__output__"] = np.asarray(pred)[:1]   # real graph row only
    out["act/__node_mask__"] = np.asarray(batch.node_mask)
    return out


def replay_bundle(path: str, atol: float = 1e-6) -> float:
    """In-container self-check: rebuild the model from a bundle's meta,
    load its stored parameters, rerun on the stored raw graph, and
    assert the captured activations reproduce.  Guards bundle integrity
    (prep + model determinism) even where torch_geometric is absent."""
    import flax

    g = np.load(path)
    a = json.loads(bytes(g["meta"]).decode())
    out = build_bundle(a)
    worst = 0.0
    for k in g.files:
        if k == "meta":
            continue
        ours, theirs = out[k], g[k]
        assert ours.shape == theirs.shape, (k, ours.shape, theirs.shape)
        if np.issubdtype(theirs.dtype, np.floating):
            d = float(np.abs(ours - theirs).max()) if theirs.size else 0.0
            worst = max(worst, d)
        else:
            assert np.array_equal(ours, theirs), k
    if worst > atol:
        raise AssertionError(f"{path}: replay drifted by {worst:.3e}")
    return worst


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="parity_golden.npz",
                   help="single-bundle output path (config via --config)")
    p.add_argument("--config", default="kpgin_spd",
                   choices=sorted(CONFIGS))
    p.add_argument("--all", action="store_true",
                   help="write every config to --out_dir/<name>.npz")
    p.add_argument("--out_dir", default="kpgnn_tpu/data/parity_golden")
    args = p.parse_args(argv)

    names = sorted(CONFIGS) if args.all else [args.config]
    written = []
    for name in names:
        a = dict(BASE_ARGS, **CONFIGS[name])
        out = build_bundle(a)
        path = (os.path.join(args.out_dir, f"{name}.npz") if args.all
                else args.out)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez_compressed(path, **out)
        print(f"wrote {path}: {len(out)} arrays "
              f"({sum(v.size for v in out.values())} elements)")
        written.append(path)
    return written if args.all else written[0]


if __name__ == "__main__":
    main()
