"""Per-layer activation dumps for cross-framework parity checks.

The rebuild's north star includes per-layer activation parity with the
PyTorch reference (BASELINE.md).  This container has no torch_geometric,
so the comparison runs outside it: `dump_activations` captures every
module's output on a given batch into an .npz keyed by module path
(e.g. `embedding_model/gnn0/__call__`), which a small PyG-side script can
diff against the reference's forward hooks.
"""
from __future__ import annotations

from typing import Dict

import numpy as np


def capture_activations(model, variables, batch) -> Dict[str, np.ndarray]:
    import flax

    _, state = model.apply(
        variables, batch, train=False,
        capture_intermediates=True, mutable=["intermediates"])
    flat = flax.traverse_util.flatten_dict(state["intermediates"])
    out = {}
    for key, val in flat.items():
        arr = val[0] if isinstance(val, tuple) else val
        out["/".join(map(str, key))] = np.asarray(arr)
    return out


def dump_activations(model, variables, batch, path: str) -> Dict[str, tuple]:
    acts = capture_activations(model, variables, batch)
    np.savez_compressed(path, **acts)
    return {k: v.shape for k, v in acts.items()}
