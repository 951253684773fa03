"""Small building blocks: torch-initialized Dense and MLP stacks."""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from .inits import torch_linear_bias_init, torch_linear_kernel_init


class TorchLinear(nn.Module):
    """nn.Dense with torch nn.Linear's default init (for activation parity)."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_linear_kernel_init, (fan_in, self.features)
        )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", torch_linear_bias_init(fan_in), (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class MLP(nn.Module):
    """Linear(+BN)(+act) stack, mirroring the reference's nn.Sequential MLPs
    (e.g. reference: layers/KPGINplus.py:25-30).  BatchNorm here is masked:
    padded rows must not contaminate batch statistics."""

    features: Sequence[int]
    use_batchnorm: bool = False
    activation: Callable = nn.relu
    final_activation: bool = True

    @nn.compact
    def __call__(self, x, *, mask: Optional[jnp.ndarray] = None,
                 train: bool = False, axis_name: Optional[str] = None):
        from .norms import MaskedBatchNorm

        n = len(self.features)
        for i, f in enumerate(self.features):
            x = TorchLinear(f, name=f"lin{i}")(x)
            last = i == n - 1
            if self.use_batchnorm:
                x = MaskedBatchNorm(name=f"bn{i}")(
                    x, mask=mask, use_running_average=not train,
                    axis_name=axis_name)
            if not last or self.final_activation:
                x = self.activation(x)
        return x
