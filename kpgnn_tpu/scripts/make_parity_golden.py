"""Produce the activation-parity golden bundle (this side of the
per-layer-activations-allclose north star, BASELINE.md).

Writes one .npz containing (a) a tiny RAW graph (edge list + bond types
+ atom codes — before any k-hop preprocessing, so each framework runs
its own prep pipeline), (b) this framework's initialized parameters,
and (c) the per-module activations captured on that graph.

The other half runs OUTSIDE this container where torch_geometric
exists: tools/parity_reference_side.py loads the reference model
(/root/reference a.k.a. JiaruiFeng/KP-GNN), copies these exact
parameters into its state_dict, preprocesses the same raw graph with
the reference's own extract_multi_hop_neighbors, and diffs every
hooked module output against the activations stored here.

Two-command workflow (README "Cross-framework parity"):
    python -m kpgnn_tpu.scripts.make_parity_golden --out parity_golden.npz
    python tools/parity_reference_side.py --reference /path/to/KP-GNN \
        --golden parity_golden.npz
"""
from __future__ import annotations

import argparse
import json

import numpy as np

# one fixed config both sides rebuild exactly (KPGIN K=2 L=2 h=16,
# geometric combine, Batch norm, JK last, sum pooling, 2-way classifier)
MODEL_ARGS = dict(
    model_name="KPGIN", hidden_size=16, num_layer=2, K=2,
    num_hop1_edge=3, max_pe_num=10, max_edge_type=2, max_edge_count=10,
    max_hop_num=3, max_distance_count=10, JK="last", combine="geometric",
    residual=False, norm_type="Batch", pooling_method="sum",
    output_size=2, input_size=21, kernel="spd", max_edge_attr_num=10,
)


def tiny_graph(seed: int = 7):
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
    x = rng.integers(0, MODEL_ARGS["input_size"], size=(n, 1))
    return n, e.astype(np.int64), ea.astype(np.int64), x.astype(np.int64)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default="parity_golden.npz")
    args = p.parse_args(argv)

    import jax
    import flax
    from kpgnn_tpu.graph.batch import collate
    from kpgnn_tpu.models import ModelConfig, make_model
    from kpgnn_tpu.prep import KHopConfig, extract_khop
    from kpgnn_tpu.utils.parity import capture_activations

    a = MODEL_ARGS
    kcfg = KHopConfig(K=a["K"], kernel=a["kernel"],
                      max_edge_attr_num=a["max_edge_attr_num"],
                      max_hop_num=a["max_hop_num"],
                      max_edge_type=a["max_edge_type"],
                      max_edge_count=a["max_edge_count"],
                      max_distance_count=a["max_distance_count"])
    n, ei, ea, x = tiny_graph()
    g = extract_khop(n, ei, ea, kcfg, x=x,
                     y=np.array([0], dtype=np.int64))
    batch = collate([g], n_pad=n + 1, e_pad=g.num_edges + 8, g_pad=2)

    mcfg = ModelConfig(
        model_name=a["model_name"], hidden_size=a["hidden_size"],
        num_layer=a["num_layer"], K=a["K"],
        num_hop1_edge=a["num_hop1_edge"], max_pe_num=a["max_pe_num"],
        max_edge_type=a["max_edge_type"], max_edge_count=a["max_edge_count"],
        max_hop_num=a["max_hop_num"],
        max_distance_count=a["max_distance_count"], JK=a["JK"],
        combine=a["combine"], residual=a["residual"],
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
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays "
          f"({sum(v.size for v in out.values())} elements)")
    return args.out


if __name__ == "__main__":
    main()
