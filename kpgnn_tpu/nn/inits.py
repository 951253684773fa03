"""Torch-compatible initializers.

Activation parity with the reference requires matching torch's default
init distributions (reference: layers/KPGIN.py:68-84 uses
kaiming_uniform_ plus fan-in uniform biases; nn.Linear / nn.Embedding
defaults elsewhere).  These helpers reproduce torch's fan computation —
including its conv-style rule for >2-D tensors, where
fan_in = shape[1] * prod(shape[2:]).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def torch_fan_in_out(shape):
    if len(shape) < 2:
        raise ValueError("fan in/out requires >= 2 dims")
    receptive = 1
    for s in shape[2:]:
        receptive *= s
    fan_in = shape[1] * receptive
    fan_out = shape[0] * receptive
    return fan_in, fan_out


def _uniform(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def kaiming_uniform(a: float = 0.0, fan_in_override: int | None = None):
    """torch.nn.init.kaiming_uniform_ on a torch-layout tensor."""
    def init(key, shape, dtype=jnp.float32):
        fan_in = fan_in_override or torch_fan_in_out(shape)[0]
        gain = math.sqrt(2.0 / (1 + a * a))
        bound = gain * math.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def fan_in_uniform_bias(fan_in: int):
    """torch's Linear/bias rule: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return _uniform(bound)


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """Default torch nn.Linear weight init on a flax-layout (in, out)
    kernel: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    fan_in = shape[0]
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_bias_init(fan_in: int):
    return fan_in_uniform_bias(fan_in)


def normal_init(stddev: float = 1.0, mean: float = 0.0):
    def init(key, shape, dtype=jnp.float32):
        return mean + stddev * jax.random.normal(key, shape, dtype)
    return init
