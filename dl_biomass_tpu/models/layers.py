"""Building-block layers with reference-parity semantics.

The reference model is built from torch_geometric ``MLP`` stacks
(``pointnet2_regressor.py:46-50``): per hidden layer Linear -> BatchNorm -> act ->
dropout, with a plain final Linear. This module reproduces those semantics in flax,
with two TPU-first twists:

  * every layer is **mask-aware** — dense padded batching means BatchNorm must
    compute statistics over valid elements only;
  * matmul inputs can be cast to bfloat16 (``compute_dtype``) to hit the MXU's
    fast path while keeping f32 params/statistics.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def resolve_activation(name: Optional[str]) -> Optional[Callable]:
    """Map the reference's activation strings (torch module names) to jax fns."""
    if name is None or name == "None":
        return None
    table = {
        "ReLU": nn.relu,
        "LeakyReLU": lambda x: nn.leaky_relu(x, negative_slope=0.01),  # torch default
        "ELU": nn.elu,
        "GELU": nn.gelu,
        "Tanh": jnp.tanh,
        "Sigmoid": nn.sigmoid,
    }
    if name not in table:
        raise ValueError(f"unknown activation {name!r}; options: {sorted(table)}")
    return table[name]


def torch_linear_init(fan_in: int):
    """torch.nn.Linear default init: kaiming_uniform(a=sqrt(5)) for the kernel and
    uniform(+-1/sqrt(fan_in)) for the bias — both reduce to U(+-1/sqrt(fan_in)).
    Matching the init keeps training dynamics comparable to the reference."""
    bound = 1.0 / np.sqrt(fan_in) if fan_in > 0 else 0.0

    def kernel_init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return kernel_init


class Dense(nn.Module):
    """Linear layer with torch-default init and optional bf16 compute."""

    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        init = torch_linear_init(fan_in)
        kernel = self.param("kernel", init, (fan_in, self.features))
        bias = self.param("bias", init, (self.features,))
        y = jnp.dot(
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        # return activations in compute_dtype: the edge tensors between layers
        # are the memory-bound cost of the SA MLPs, and bf16 halves that HBM
        # traffic (params, accumulation and BN statistics stay f32)
        return (y + bias).astype(self.compute_dtype)


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with torch semantics, over valid (mask=True) elements only.

    torch defaults: eps=1e-5, momentum=0.1 (running = 0.9*running + 0.1*batch),
    biased variance for normalization, unbiased for the running estimate.
    """

    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, mask=None, *, use_running_average: bool):
        c = x.shape[-1]
        gamma = self.param("scale", nn.initializers.ones, (c,))
        beta = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            # reduce over all leading axes in place — a reshape(-1, c) here
            # materializes a flat copy of the (huge) edge tensor in HBM
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.float32)
            if mask is not None:
                m = jnp.expand_dims(mask, -1).astype(jnp.float32)
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xf * m, axis=axes) / cnt
                var = jnp.sum(jnp.square(xf - mean) * m, axis=axes) / cnt
            else:
                cnt = jnp.float32(np.prod(x.shape[:-1]))
                mean = jnp.mean(xf, axis=axes)
                var = jnp.var(xf, axis=axes)
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        inv = jax.lax.rsqrt(var + self.eps)
        out = (x.astype(jnp.float32) - mean) * (inv * gamma) + beta
        return out.astype(x.dtype)  # preserve activation dtype (bf16 pipeline)


class MLP(nn.Module):
    """torch_geometric-style MLP: hidden layers Linear->BN->act->dropout, plain
    final Linear (plain_last=True). ``channels`` includes the input width, e.g.
    ``[4, 64, 64, 128]`` mirrors ``MLP([3+F, 64, 64, 128])`` in the reference."""

    channels: Sequence[int]
    act: Optional[str] = "ReLU"
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        # ``train`` is positional-friendly so nn.remat can mark it static
        act = resolve_activation(self.act)
        chans = list(self.channels)
        for i, width in enumerate(chans[1:-1]):
            x = Dense(width, compute_dtype=self.compute_dtype, name=f"lin{i}")(x)
            x = MaskedBatchNorm(name=f"bn{i}")(x, mask, use_running_average=not train)
            if act is not None:
                x = act(x)
            if self.dropout > 0.0:
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = Dense(chans[-1], compute_dtype=self.compute_dtype, name=f"lin{len(chans) - 2}")(x)
        return x
