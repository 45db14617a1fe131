"""PyTorch-``nn.Linear``-matched initialization for Flax Dense layers.

The reference implementation leaves nearly every layer on torch's default
``nn.Linear`` init: kernel ~ kaiming_uniform(a=sqrt(5)) which reduces to
U(+-1/sqrt(fan_in)) (std 1/sqrt(3*fan_in)), and bias ~ U(+-1/sqrt(fan_in)).
Flax's default (lecun_normal, zero bias) has 3x the kernel *variance* —
enough to shift early VAE dynamics: the controlled head-to-head
(runs/h2h, scripts/headtohead.py) showed the reference's init-time
KL_global at the exact mu~0 value (36.3 for z_g=64, logvar bias −2) while
lecun-normal landed at ~50, and the over-dispersed latent let KL pressure
prune the sequence-identity dims of z_l before they became useful
(seq acc 0.44 ref vs 0.11 ours at epoch 200, same data/hyperparameters).

``TorchLinear`` is a drop-in ``nn.Dense`` replacement producing the same
parameter tree (``<name>/kernel``, ``<name>/bias``) with torch-matched
distributions. ``fan_in`` may be overridden for layers whose reference
counterpart is a single matrix that we split algebraically (the EGNN edge
MLP's first layer: joint fan_in 2H+1, decoder.py:17-19).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Array = jax.Array
Dtype = Any


def torch_kernel_init(fan_in: Optional[int] = None, scale: float = 1.0
                      ) -> Callable:
    """U(+-scale/sqrt(fan_in)); fan_in defaults to ``shape[0]``."""

    def init(key, shape, dtype=jnp.float32):
        fi = fan_in if fan_in is not None else shape[0]
        bound = scale / math.sqrt(fi)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_bias_init(fan_in: int, scale: float = 1.0) -> Callable:
    """U(+-scale/sqrt(fan_in)) — torch biases are NOT zero-initialized."""

    def init(key, shape, dtype=jnp.float32):
        bound = scale / math.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def torch_logvar_bias_init(fan_in: int, z: int) -> Callable:
    """Torch-default bias with the logvar half overwritten to −2.0 — the
    reference initializes the full bias U(+-1/sqrt(fan)) and then sets
    ``bias[z:] = -2.0`` (encoder.py:172-175), leaving the mu half random."""

    base = torch_bias_init(fan_in)

    def init(key, shape, dtype=jnp.float32):
        b = base(key, shape, dtype)
        return b.at[z:].set(-2.0)

    return init


class TorchLinear(nn.Module):
    """``nn.Dense`` with PyTorch ``nn.Linear`` default initialization.

    Parameter tree matches ``nn.Dense`` (``kernel`` [in, out], ``bias``
    [out]) so modules can switch without breaking checkpoints.

    - ``fan_in``: override the variance fan-in (for algebraically split
      reference matrices).
    - ``kernel_scale``: post-init multiplicative scale on the *kernel
      distribution* (reference ``weight.mul_(0.1)`` patterns).
    - ``zero_bias``: bias = 0 (reference ``bias.zero_()`` patterns).
    - ``logvar_bias_z``: when set, bias[z:] = −2.0 on top of the torch
      default (latent-head pattern).
    """

    features: int
    dtype: Dtype = jnp.float32
    use_bias: bool = True
    fan_in: Optional[int] = None
    kernel_scale: float = 1.0
    zero_bias: bool = False
    logvar_bias_z: Optional[int] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        fi = self.fan_in if self.fan_in is not None else x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init(fi, self.kernel_scale),
            (x.shape[-1], self.features))
        y = x.astype(self.dtype) @ kernel.astype(self.dtype)
        if self.use_bias:
            if self.zero_bias:
                bias_init = nn.initializers.zeros
            elif self.logvar_bias_z is not None:
                bias_init = torch_logvar_bias_init(fi, self.logvar_bias_z)
            else:
                bias_init = torch_bias_init(fi)
            bias = self.param("bias", bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y
