#!/usr/bin/env python
"""Reference-side half of the per-layer activation parity check.

Runs anywhere torch and a checkout of the reference repo
(JiaruiFeng/KP-GNN) exist.  With real torch_geometric installed it uses
that; otherwise it installs tools/pyg_shim.py (a from-the-API-contract
implementation of the small PyG subset the reference uses), which makes
the check executable inside the TPU container itself:

    python tools/parity_reference_side.py \
        --reference /root/reference \
        --golden kpgnn_tpu/data/parity_golden/<name>.npz   [--atol 1e-4]

The golden bundle (kpgnn_tpu/scripts/make_parity_golden.py) carries the
raw graph, the TPU framework's initialized parameters, and its captured
per-module activations.  This script rebuilds the SAME model from the
reference code (models/model_utils.make_GNN + GraphClassification),
copies the parameters into its state_dict (transposing Linear kernels:
flax stores (in, out), torch (out, in)), preprocesses the same raw
graph with the reference's own data_utils.extract_multi_hop_neighbors,
registers forward hooks mirroring utils/parity.py module paths, and
reports the max abs difference per layer.  Exit 0 iff everything is
within --atol.  Pass --golden a directory to loop over every bundle.

Covered families/features (one bundle each, make_parity_golden.CONFIGS):
KPGIN spd/gd, KPGCN, KPGraphSAGE, KPGINPlus (window + tanh gate +
virtual node), KPGINPrime (GINE stack), attention combine +
JK-attention + rd.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

LSTM_TENSORS = [
    ("w_ih_fwd", "weight_ih_l0"), ("w_hh_fwd", "weight_hh_l0"),
    ("b_ih_fwd", "bias_ih_l0"), ("b_hh_fwd", "bias_hh_l0"),
    ("w_ih_bwd", "weight_ih_l0_reverse"), ("w_hh_bwd", "weight_hh_l0_reverse"),
    ("b_ih_bwd", "bias_ih_l0_reverse"), ("b_hh_bwd", "bias_hh_l0_reverse"),
]


def ensure_pyg():
    try:
        import torch_geometric  # noqa: F401
        return "torch_geometric"
    except ImportError:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import pyg_shim

        pyg_shim.install()
        return "pyg_shim"


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
        residual=a["residual"], virtual_node=a.get("virtual_node", False),
        use_rd=a.get("use_rd", False), eps=0.0,
        wo_peripheral_edge=False, wo_peripheral_configuration=False,
        wo_path_encoding=False, wo_edge_feature=False,
        drop_prob=0.0, aggr=a.get("aggr", "add"), head=1,
        input_size=a["input_size"], output_size=a["output_size"],
        pooling_method=a["pooling_method"], train_eps=False)
    layer = make_gnn_layer(ns)
    init_emb = EmbeddingEncoder(ns.input_size, ns.hidden_size)
    kwargs = dict(
        num_layer=ns.num_layer, gnn_layer=layer, JK=ns.JK,
        norm_type=ns.norm_type, init_emb=init_emb, residual=ns.residual,
        virtual_node=ns.virtual_node, use_rd=ns.use_rd,
        num_hop1_edge=ns.num_hop1_edge, max_edge_count=ns.max_edge_count,
        max_hop_num=ns.max_hop_num,
        max_distance_count=ns.max_distance_count,
        wo_peripheral_edge=ns.wo_peripheral_edge,
        wo_peripheral_configuration=ns.wo_peripheral_configuration,
        drop_prob=0.0)
    if ns.model_name == "KPGINPrime":
        kwargs["num_l1_layer"] = a.get("num_l1_layer", 1)
    gnn = make_GNN(ns)(**kwargs)
    model = GraphClassification(embedding_model=gnn,
                                pooling_method=ns.pooling_method,
                                output_size=ns.output_size)
    return model, ns


def _layer_names(a):
    """[(flax layer name, torch container path)] per layer, in order."""
    L = a["num_layer"]
    if a["model_name"] == "KPGINPrime":
        L1 = a.get("num_l1_layer", 1)
        return ([(f"khop_gnn{l}", f"khop_gnns.{l}") for l in range(L1)]
                + [(f"gine{i}", f"gins.{i}") for i in range(L - L1)])
    return [(f"gnn{l}", f"gnns.{l}") for l in range(L)]


def load_params(model, g):
    import torch

    a = json.loads(bytes(g["meta"]).decode())
    sd = {}
    P = "params/embedding_model"
    B = "batch_stats/embedding_model"

    def t(key, transpose=False, zero_row0=False):
        v = torch.tensor(np.asarray(g[key]))
        if zero_row0:
            # the reference declares these embeddings padding_idx=0 (row
            # 0 zero at init, gradient-masked); the flax side keeps the
            # raw table and zeroes row 0 at use.  load_state_dict would
            # smuggle the unused raw row into torch's lookup, so zero it
            # here — semantically exact on both sides.
            v = v.clone()
            v[0] = 0.0
        return v.T.contiguous() if transpose else v

    def map_lstm(fp, tp):
        for ours, theirs in LSTM_TENSORS:
            sd[f"{tp}.{theirs}"] = t(f"{fp}/{ours}")

    def map_mlp(fp, tp):
        """flax MLP(lin0,bn0,lin1,bn1) -> torch Sequential(0,1,3,4)."""
        for i, (lin, bn) in enumerate((("lin0", "bn0"), ("lin1", "bn1"))):
            j = 3 * i
            sd[f"{tp}.{j}.weight"] = t(f"{P}/{fp}/{lin}/kernel", True)
            sd[f"{tp}.{j}.bias"] = t(f"{P}/{fp}/{lin}/bias")
            sd[f"{tp}.{j + 1}.weight"] = t(f"{P}/{fp}/{bn}/scale")
            sd[f"{tp}.{j + 1}.bias"] = t(f"{P}/{fp}/{bn}/bias")
            sd[f"{tp}.{j + 1}.running_mean"] = t(f"{B}/{fp}/{bn}/mean")
            sd[f"{tp}.{j + 1}.running_var"] = t(f"{B}/{fp}/{bn}/var")

    sd["embedding_model.init_proj.init_proj.weight"] = t(
        f"{P}/init_encoder/init_proj/embedding")

    fam = a["model_name"]
    K = a["K"]
    for li, (fl, tl) in enumerate(_layer_names(a)):
        fp, tp = f"{P}/{fl}", f"embedding_model.{tl}"
        is_gine = fl.startswith("gine")
        k_l = (1 if is_gine
               else min(li + 1, K) if fam == "KPGINPlus" else K)
        sd[f"{tp}.hop1_edge_emb.weight"] = t(f"{fp}/hop1_edge_emb",
                                             zero_row0=True)
        if k_l > 1:
            sd[f"{tp}.hopk_edge_emb.weight"] = t(f"{fp}/hopk_edge_emb",
                                                 zero_row0=True)
            sd[f"{tp}.hopk_node_path_emb.weight"] = t(
                f"{fp}/hopk_node_path_emb", zero_row0=True)
            if a["combine"] == "geometric":
                sd[f"{tp}.combine.alphas"] = t(f"{fp}/combine/alphas")
            else:
                map_lstm(f"{fp}/combine/attention_lstm",
                         f"{tp}.combine.attention_lstm")
            if fam != "KPGINPlus":
                sd[f"{tp}.combine_proj.weight"] = t(
                    f"{fp}/combine_proj/kernel", True)
                sd[f"{tp}.combine_proj.bias"] = t(f"{fp}/combine_proj/bias")
        if is_gine or fam == "KPGINPlus":
            map_mlp(f"{fl}/mlp", f"{tp}.mlp")
        elif fam in ("KPGIN", "KPGINPrime"):
            for name in ("hop_proj1", "hop_bias1", "hop_proj2", "hop_bias2"):
                sd[f"{tp}.{name}"] = t(f"{fp}/{name}")
        elif fam == "KPGCN":
            sd[f"{tp}.hop_proj.weight"] = t(f"{fp}/hop_proj/kernel", True)
            sd[f"{tp}.hop_proj.bias"] = t(f"{fp}/hop_proj/bias")
        elif fam == "KPGraphSAGE":
            sd[f"{tp}.hop_proj"] = t(f"{fp}/hop_proj")
            sd[f"{tp}.hop_bias"] = t(f"{fp}/hop_bias")

    for l in range(a["num_layer"]):
        sd[f"embedding_model.norms.{l}.module.weight"] = t(
            f"{P}/norm{l}/scale")
        sd[f"embedding_model.norms.{l}.module.bias"] = t(
            f"{P}/norm{l}/bias")
        sd[f"embedding_model.norms.{l}.module.running_mean"] = t(
            f"{B}/norm{l}/mean")
        sd[f"embedding_model.norms.{l}.module.running_var"] = t(
            f"{B}/norm{l}/var")
    # peripheral encoders (FeatureConcatEncoder: embedding_list.{i} + proj)
    for side, nemb in (("peripheral_edge_embedding", 2),
                       ("peripheral_configuration_embedding",
                        a["max_hop_num"] + 1)):
        for i in range(nemb):
            sd[f"embedding_model.{side}.embedding_list.{i}.weight"] = t(
                f"{P}/peripheral/{side}/emb{i}/embedding")
        sd[f"embedding_model.{side}.proj.weight"] = t(
            f"{P}/peripheral/{side}/proj/kernel", True)
        sd[f"embedding_model.{side}.proj.bias"] = t(
            f"{P}/peripheral/{side}/proj/bias")
    sd["embedding_model.pew"] = t(f"{P}/peripheral/pew")
    sd["embedding_model.pcw"] = t(f"{P}/peripheral/pcw")
    if a.get("use_rd"):
        sd["embedding_model.rd_projection.weight"] = t(
            f"{P}/rd_projection/kernel", True)
        sd["embedding_model.rd_projection.bias"] = t(
            f"{P}/rd_projection/bias")
    if a.get("virtual_node"):
        sd["embedding_model.virtualnode_embedding.weight"] = t(
            f"{P}/virtualnode/virtualnode_embedding")
        for i in range(a["num_layer"] - 1):
            map_mlp(f"virtualnode/mlp_virtualnode_{i}",
                    f"embedding_model.mlp_virtualnode_list.{i}")
    if a["JK"] == "attention":
        map_lstm(f"{P}/attention_lstm",
                 "embedding_model.attention_lstm")
    sd["embedding_model.output_proj.0.weight"] = t(
        f"{P}/output_proj/kernel", True)
    sd["embedding_model.output_proj.0.bias"] = t(
        f"{P}/output_proj/bias")
    sd["classifier.weight"] = t("params/classifier/kernel", True)
    sd["classifier.bias"] = t("params/classifier/bias")

    missing, unexpected = model.load_state_dict(sd, strict=False)
    # eps / num_batches_tracked buffers default correctly on both sides;
    # everything else must map
    bad = [m for m in missing
           if not (m.endswith(".eps") or m.endswith("num_batches_tracked"))]
    if bad or unexpected:
        raise SystemExit(f"state_dict mismatch:\n missing {bad}\n "
                         f"unexpected {unexpected}")
    return a


def build_data(g, a, ref_path):
    import torch
    from torch_geometric.data import Data
    from data_utils import extract_multi_hop_neighbors, post_transform
    if a.get("use_rd"):
        from data_utils import resistance_distance

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
    if a.get("use_rd"):
        data = resistance_distance(data)
    data = post_transform(False, False)(data)
    from torch_geometric.loader import DataLoader
    return next(iter(DataLoader([data], batch_size=1)))


def check_bundle(golden_path, ref_path, atol):
    import torch

    g = np.load(golden_path)
    model, ns = build_model(
        json.loads(bytes(g["meta"]).decode()), ref_path)
    a = load_params(model, g)
    model.eval()
    batch = build_data(g, a, ref_path)

    acts = {}

    def hook(name):
        def fn(mod, inp, out):
            # clone: the reference mutates activations in place after
            # modules return (x[:, 1:] += pe, masked_fill_), so a view
            # captured here would be corrupted by the time it's compared
            acts[name] = (out.detach().clone().numpy()
                          if torch.is_tensor(out) else out)
        return fn

    containers = {"khop_gnns": model.embedding_model.khop_gnns,
                  "gins": model.embedding_model.gins} \
        if a["model_name"] == "KPGINPrime" \
        else {"gnns": model.embedding_model.gnns}
    for fl, tl in _layer_names(a):
        cont, idx = tl.split(".")
        containers[cont][int(idx)].register_forward_hook(
            hook(f"embedding_model/{fl}/__call__"))
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
    return worst


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--reference", required=True,
                   help="path to the KP-GNN checkout")
    p.add_argument("--golden", required=True,
                   help=".npz bundle, or a directory of bundles")
    p.add_argument("--atol", type=float, default=1e-4)
    args = p.parse_args(argv)

    backend = ensure_pyg()
    print(f"PyG backend: {backend}")
    bundles = ([os.path.join(args.golden, f)
                for f in sorted(os.listdir(args.golden))
                if f.endswith(".npz")]
               if os.path.isdir(args.golden) else [args.golden])
    failed = []
    for b in bundles:
        print(f"\n==== {os.path.basename(b)} ====")
        worst = check_bundle(b, args.reference, args.atol)
        status = "OK" if worst <= args.atol else "FAIL"
        print(f"PARITY {status} (worst {worst:.3e})")
        if worst > args.atol:
            failed.append((b, worst))
    if failed:
        raise SystemExit(f"PARITY FAIL: {failed}")
    print(f"\nall {len(bundles)} bundle(s) within atol={args.atol}")


if __name__ == "__main__":
    main()
