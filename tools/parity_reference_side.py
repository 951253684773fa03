#!/usr/bin/env python
"""Reference-side half of the per-layer activation parity check.

RUNS OUTSIDE the TPU container, anywhere torch + torch_geometric and a
checkout of the reference repo (JiaruiFeng/KP-GNN) exist:

    python tools/parity_reference_side.py \
        --reference /path/to/KP-GNN --golden parity_golden.npz

The golden bundle (kpgnn_tpu/scripts/make_parity_golden.py) carries the
raw graph, the TPU framework's initialized parameters, and its captured
per-module activations.  This script rebuilds the SAME model from the
reference code (models/model_utils.make_GNN + GraphClassification),
copies the parameters into its state_dict (transposing Linear kernels:
flax stores (in, out), torch (out, in)), preprocesses the same raw
graph with the reference's own data_utils.extract_multi_hop_neighbors,
registers forward hooks mirroring utils/parity.py module paths, and
reports the max abs difference per layer.  Exit 0 iff everything is
within --atol.
"""
from __future__ import annotations

import argparse
import json
import sys
import types

import numpy as np

# flax module path prefix -> torch state_dict prefix
#   per-GNN-layer tensors share names by construction (hop_proj1,
#   hop_bias1, hop1_edge_emb, ...); only containers differ.
LAYER_TENSORS = [
    # (flax key, torch key, transpose?)
    ("hop1_edge_emb", "hop1_edge_emb.weight", False),
    ("hopk_edge_emb", "hopk_edge_emb.weight", False),
    ("hopk_node_path_emb", "hopk_node_path_emb.weight", False),
    ("hop_proj1", "hop_proj1", False),
    ("hop_bias1", "hop_bias1", False),
    ("hop_proj2", "hop_proj2", False),
    ("hop_bias2", "hop_bias2", False),
    ("combine/alphas", "combine.alphas", False),
    ("combine_proj/kernel", "combine_proj.weight", True),
    ("combine_proj/bias", "combine_proj.bias", False),
]


def build_model(a, ref_path):
    sys.path.insert(0, ref_path)
    from layers.input_encoder import EmbeddingEncoder
    from layers.layer_utils import make_gnn_layer
    from models.model_utils import make_GNN
    from models.GraphClassification import GraphClassification

    ns = types.SimpleNamespace(
        model_name=a["model_name"], hidden_size=a["hidden_size"],
        num_layer=a["num_layer"], K=a["K"], kernel=a["kernel"],
        num_hop1_edge=a["num_hop1_edge"], max_pe_num=a["max_pe_num"],
        max_edge_type=a["max_edge_type"],
        max_edge_count=a["max_edge_count"],
        max_hop_num=a["max_hop_num"],
        max_distance_count=a["max_distance_count"],
        combine=a["combine"], JK=a["JK"], norm_type=a["norm_type"],
        residual=a["residual"], virtual_node=False, use_rd=False,
        wo_peripheral_edge=False, wo_peripheral_configuration=False,
        wo_path_encoding=False, wo_edge_feature=False,
        drop_prob=0.0, aggr="add", head=1, input_size=a["input_size"],
        output_size=a["output_size"],
        pooling_method=a["pooling_method"], train_eps=False)
    layer = make_gnn_layer(ns)
    init_emb = EmbeddingEncoder(ns.input_size, ns.hidden_size)
    gnn = make_GNN(ns)(
        num_layer=ns.num_layer, gnn_layer=layer, JK=ns.JK,
        norm_type=ns.norm_type, init_emb=init_emb, residual=ns.residual,
        virtual_node=ns.virtual_node, use_rd=ns.use_rd,
        num_hop1_edge=ns.num_hop1_edge, max_edge_count=ns.max_edge_count,
        max_hop_num=ns.max_hop_num,
        max_distance_count=ns.max_distance_count,
        wo_peripheral_edge=ns.wo_peripheral_edge,
        wo_peripheral_configuration=ns.wo_peripheral_configuration,
        drop_prob=0.0)
    model = GraphClassification(embedding_model=gnn,
                                pooling_method=ns.pooling_method,
                                output_size=ns.output_size)
    return model, ns


def load_params(model, g):
    import torch

    a = json.loads(bytes(g["meta"]).decode())
    sd = {}
    P = "params/embedding_model"

    def t(key, transpose=False):
        v = torch.tensor(np.asarray(g[key]))
        return v.T.contiguous() if transpose else v

    sd["embedding_model.init_proj.init_proj.weight"] = t(
        f"{P}/init_encoder/init_proj/embedding")
    for l in range(a["num_layer"]):
        for fk, tk, tr in LAYER_TENSORS:
            sd[f"embedding_model.gnns.{l}.{tk}"] = t(
                f"{P}/gnn{l}/{fk}", tr)
        sd[f"embedding_model.norms.{l}.module.weight"] = t(
            f"{P}/norm{l}/scale")
        sd[f"embedding_model.norms.{l}.module.bias"] = t(
            f"{P}/norm{l}/bias")
        sd[f"embedding_model.norms.{l}.module.running_mean"] = t(
            f"batch_stats/embedding_model/norm{l}/mean")
        sd[f"embedding_model.norms.{l}.module.running_var"] = t(
            f"batch_stats/embedding_model/norm{l}/var")
    # peripheral encoders (FeatureConcatEncoder: embedding_list.{i} + proj)
    for side, nemb in (("peripheral_edge_embedding", 2),
                       ("peripheral_configuration_embedding", 4)):
        for i in range(nemb):
            sd[f"embedding_model.{side}.embedding_list.{i}.weight"] = t(
                f"{P}/peripheral/{side}/emb{i}/embedding")
        sd[f"embedding_model.{side}.proj.weight"] = t(
            f"{P}/peripheral/{side}/proj/kernel", True)
        sd[f"embedding_model.{side}.proj.bias"] = t(
            f"{P}/peripheral/{side}/proj/bias")
    sd["embedding_model.pew"] = t(f"{P}/peripheral/pew")
    sd["embedding_model.pcw"] = t(f"{P}/peripheral/pcw")
    sd["embedding_model.output_proj.0.weight"] = t(
        f"{P}/output_proj/kernel", True)
    sd["embedding_model.output_proj.0.bias"] = t(
        f"{P}/output_proj/bias")
    sd["classifier.weight"] = t("params/classifier/kernel", True)
    sd["classifier.bias"] = t("params/classifier/bias")

    missing, unexpected = model.load_state_dict(sd, strict=False)
    # eps buffers default to zero on both sides; everything else must map
    bad = [m for m in missing if not m.endswith(".eps")]
    if bad or unexpected:
        raise SystemExit(f"state_dict mismatch:\n missing {bad}\n "
                         f"unexpected {unexpected}")
    return a


def build_data(g, a, ref_path):
    import torch
    from torch_geometric.data import Data
    from data_utils import extract_multi_hop_neighbors, post_transform

    n = int(g["raw/n"][0])
    data = Data(x=torch.tensor(g["raw/x"]),
                edge_index=torch.tensor(g["raw/edge_index"]),
                edge_attr=torch.tensor(g["raw/edge_attr"]),
                y=torch.tensor([0]))
    data.num_nodes = n
    data = extract_multi_hop_neighbors(
        data, a["K"], a["max_pe_num"], a["max_hop_num"],
        a["max_edge_type"], a["max_edge_count"],
        a["max_distance_count"], a["kernel"])
    data = post_transform(False, False)(data)
    from torch_geometric.loader import DataLoader
    return next(iter(DataLoader([data], batch_size=1)))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference", required=True,
                   help="path to the KP-GNN checkout")
    p.add_argument("--golden", required=True)
    p.add_argument("--atol", type=float, default=1e-4)
    args = p.parse_args()

    import torch

    g = np.load(args.golden)
    model, ns = build_model(
        json.loads(bytes(g["meta"]).decode()), args.reference)
    a = load_params(model, g)
    model.eval()
    batch = build_data(g, a, args.reference)

    acts = {}

    def hook(name):
        def fn(mod, inp, out):
            acts[name] = out.detach().numpy() if torch.is_tensor(out) \
                else out
        return fn

    for l in range(a["num_layer"]):
        model.embedding_model.gnns[l].register_forward_hook(
            hook(f"embedding_model/gnn{l}/__call__"))
    with torch.no_grad():
        pred = model(batch).numpy()

    mask = g["act/__node_mask__"].astype(bool)
    worst = 0.0
    for name, ref_act in acts.items():
        key = "act/" + name
        if key not in g:
            print(f"SKIP {name}: not captured on the TPU side")
            continue
        ours = g[key][: mask.size][mask[: g[key].shape[0]]]
        theirs = ref_act[: ours.shape[0]]
        d = float(np.abs(ours - theirs).max())
        worst = max(worst, d)
        print(f"{name}: max|diff| = {d:.3e}")
    d = float(np.abs(g["act/__output__"] - pred).max())
    worst = max(worst, d)
    print(f"final output: max|diff| = {d:.3e}")
    if worst > args.atol:
        raise SystemExit(f"PARITY FAIL: worst diff {worst:.3e} > "
                         f"{args.atol}")
    print(f"PARITY OK (worst {worst:.3e})")


if __name__ == "__main__":
    main()
