"""Building-block layers with reference-parity semantics.

The reference model is built from torch_geometric ``MLP`` stacks
(``pointnet2_regressor.py:46-50``): per hidden layer Linear -> BatchNorm -> act ->
dropout, with a plain final Linear. This module reproduces those semantics in flax,
with three TPU-first twists:

  * every layer is **mask-aware** — dense padded batching means BatchNorm must
    compute statistics over valid elements only;
  * matmul inputs can be cast to bfloat16 (``compute_dtype``) to hit the MXU's
    fast path while keeping f32 params/statistics;
  * train-mode statistics use the one-pass sum/sumsq form so XLA reads the huge
    (B, M, K, C) edge tensor once per BatchNorm, not twice.

``Dense``/``MaskedBatchNorm`` are setup-based and expose their raw parameters
(``kernel_bias``, ``fold``, ``update_running``) so fused Pallas SA kernels can
consume the identical parameter tree (see ops/pallas_sa_train.py).
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
    in_features: int
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        init = torch_linear_init(self.in_features)
        self.kernel = self.param("kernel", init, (self.in_features, self.features))
        self.bias = self.param("bias", init, (self.features,))

    def kernel_bias(self):
        """Raw f32 parameters — for the fused-stats path's analytic moments."""
        return self.kernel, self.bias

    def __call__(self, x, *, flatten: bool = False):
        if x.shape[-1] != self.in_features:
            raise ValueError(
                f"Dense expected {self.in_features} input features, got {x.shape[-1]}"
            )
        shp = x.shape
        if flatten and x.ndim > 2:
            # EVAL-ONLY layout hint (round 5): on a 4-D operand XLA's TPU dot
            # picks an M-minor output layout for 64-wide outputs, then pays a
            # full relayout copy (measured 3.6 ms at SA1 B=36) to feed the
            # fused lin2+max reduce; an explicit 2-D operand flips that choice
            # (eval step 32.6 -> 30.6 ms). Same contraction, bit-identical
            # output. NOT for training: the same reshape reorganizes the
            # backward's transposed dots and measured 57 -> 184 ms/step.
            x = x.reshape(-1, shp[-1])
        y = jnp.dot(
            x.astype(self.compute_dtype),
            self.kernel.astype(self.compute_dtype),
            # f32 accumulation for <=f32 compute; f64 under jax_enable_x64 tests
            preferred_element_type=jnp.promote_types(self.compute_dtype, jnp.float32),
        )
        # return activations in compute_dtype: the edge tensors between layers
        # are the memory-bound cost of the SA MLPs, and bf16 halves that HBM
        # traffic (params, accumulation and BN statistics stay f32)
        y = (y + self.bias).astype(self.compute_dtype)
        if flatten and len(shp) > 2:
            y = y.reshape(*shp[:-1], self.features)
        return y


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d with torch semantics, over valid (mask=True) elements only.

    torch defaults: eps=1e-5, momentum=0.1 (running = 0.9*running + 0.1*batch),
    biased variance for normalization, unbiased for the running estimate.
    """

    num_features: int
    eps: float = 1e-5
    momentum: float = 0.1

    def setup(self):
        c = self.num_features
        self.gamma = self.param("scale", nn.initializers.ones, (c,))
        self.beta = self.param("bias", nn.initializers.zeros, (c,))
        self.ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,)))
        self.ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,)))

    def params_(self):
        """Raw (gamma, beta) — for the fused Pallas SA path."""
        return self.gamma, self.beta

    def running(self):
        """Running (mean, var) — for the fused eval path."""
        return self.ra_mean.value, self.ra_var.value

    def update_running(self, mean, var, cnt):
        """EMA update with torch semantics (unbiased var for the running stat)."""
        if self.is_initializing():
            return
        unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
        self.ra_mean.value = (1 - self.momentum) * self.ra_mean.value + self.momentum * mean
        self.ra_var.value = (1 - self.momentum) * self.ra_var.value + self.momentum * unbiased

    def fold(self, mean, var):
        """Fold the normalize into (scale, shift): y = x*scale + shift."""
        scale = self.gamma * jax.lax.rsqrt(var + self.eps)
        return scale, self.beta - mean * scale

    def __call__(self, x, mask=None, *, use_running_average: bool):
        if use_running_average:
            mean, var = self.ra_mean.value, self.ra_var.value
        else:
            # reduce over all leading axes in place — a reshape(-1, c) here
            # materializes a flat copy of the (huge) edge tensor in HBM
            axes = tuple(range(x.ndim - 1))
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            if mask is not None:
                # sum/sumsq form: both reductions read x ONCE (XLA multi-output
                # fusion) — the (x - mean)^2 form forces a second full pass over
                # the huge edge tensor after the mean is known.
                # Precision envelope: E[x^2]-mean^2 in f32 loses ~2^-24*mean^2
                # absolute, so it needs |mean|/std << ~2^10 to keep var to a few
                # percent. Post-linear activations here have |mean|/std < ~10
                # (torch-init weights, centered inputs); the f64 interpret test
                # (tests/test_pallas_sa_train.py) pins the semantics
                m = jnp.expand_dims(mask, -1).astype(jnp.float32)
                cnt = jnp.maximum(jnp.sum(m), 1.0)
                xm = xf * m
                mean = jnp.sum(xm, axis=axes) / cnt
                e2 = jnp.sum(xm * xf, axis=axes) / cnt
                var = jnp.maximum(e2 - mean * mean, 0.0)
            else:
                cnt = jnp.float32(np.prod(x.shape[:-1]))
                mean = jnp.mean(xf, axis=axes)
                e2 = jnp.mean(xf * xf, axis=axes)
                var = jnp.maximum(e2 - mean * mean, 0.0)
            self.update_running(mean, var, cnt)
        scale, shift = self.fold(mean, var)
        out = x.astype(jnp.promote_types(x.dtype, jnp.float32)) * scale + shift
        return out.astype(x.dtype)  # preserve activation dtype (bf16 pipeline)


class MLP(nn.Module):
    """torch_geometric-style MLP: hidden layers Linear->BN->act->dropout, plain
    final Linear (plain_last=True). ``channels`` includes the input width, e.g.
    ``[4, 64, 64, 128]`` mirrors ``MLP([3+F, 64, 64, 128])`` in the reference.

    ``analytic_bn=True`` switches the hidden layers to the folded form: BN
    statistics of ``y = x @ W + b`` are derived **analytically from input
    moments** (``s1 = Σx``, ``M2 = XᵀX`` — one MXU matmul) instead of read-back
    reduction passes over the (huge) output, and the normalize then folds into
    ``(W·scale, b·scale+shift)`` so the producing matmul writes
    normalized+activated output directly. In train mode this turns the
    3-reads/2-writes per hidden layer (matmul write, stats read, normalize
    read+write) into 2-reads/1-write of edge-tensor traffic — the SA MLPs are
    HBM-bound, so this is a direct step-time win. Same algebra as the standard
    path (exact in real arithmetic; one-pass E[x²]-mean² precision envelope is
    identical — see MaskedBatchNorm), pinned by an f64 equivalence test.
    """

    channels: Sequence[int]
    act: Optional[str] = "ReLU"
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    analytic_bn: bool = False

    def setup(self):
        # setup-based (not @nn.compact) so callers can reach layer 0's
        # parameters without running the stack — the per-point first-layer
        # split in SAModule (split_first_layer) applies layer 0 itself and
        # re-enters via from_z0. Attribute names keep the compact-era param
        # tree (lin0/bn0/...), so existing checkpoints load unchanged.
        chans = list(self.channels)
        for i, w in enumerate(chans[1:]):
            setattr(self, f"lin{i}", Dense(
                w, in_features=chans[i], compute_dtype=self.compute_dtype))
        for i, w in enumerate(chans[1:-1]):
            setattr(self, f"bn{i}", MaskedBatchNorm(num_features=w))
        if self.dropout > 0.0:
            self.drop = nn.Dropout(self.dropout)

    def _layers(self):
        n = len(self.channels) - 1
        return ([getattr(self, f"lin{i}") for i in range(n)],
                [getattr(self, f"bn{i}") for i in range(n - 1)])

    def first_dense(self) -> Dense:
        """Layer 0's Dense — for callers that apply layer 0 themselves (the
        per-point split in SAModule); the param tree stays identical."""
        return self.lin0

    def _post(self, x, bn, mask, act, train):
        x = bn(x, mask, use_running_average=not train)
        if act is not None:
            x = act(x)
        if self.dropout > 0.0:
            x = self.drop(x, deterministic=not train)
        return x

    def __call__(self, x, mask=None, train: bool = False):
        # ``train`` is positional-friendly so nn.remat can mark it static
        act = resolve_activation(self.act)
        lins, bns = self._layers()

        if self.analytic_bn:
            return self._folded(x, mask, lins, bns, act, train)

        flat = not train  # eval-only dot layout hint (see Dense.__call__)
        for lin, bn in zip(lins[:-1], bns):
            x = self._post(lin(x, flatten=flat), bn, mask, act, train)
        return lins[-1](x, flatten=flat)

    def from_z0(self, z0, mask=None, train: bool = False):
        """Continue the stack from layer 0's PRE-BN output ``z0`` (x @ W0 +
        b0, already computed by the caller — see SAModule's per-point
        first-layer split). Identical math to ``__call__`` given the same
        z0; layer 0's parameters still live in this module's tree."""
        if self.analytic_bn:
            raise ValueError(
                "from_z0 is incompatible with analytic_bn (folded BN derives "
                "statistics from layer INPUT moments; z0 is the output)"
            )
        act = resolve_activation(self.act)
        lins, bns = self._layers()
        if not bns:  # single-linear MLP: z0 IS the final output
            return z0
        flat = not train  # eval-only dot layout hint (see Dense.__call__)
        x = self._post(z0, bns[0], mask, act, train)
        for lin, bn in zip(lins[1:-1], bns[1:]):
            x = self._post(lin(x, flatten=flat), bn, mask, act, train)
        return lins[-1](x, flatten=flat)

    def _folded(self, x, mask, lins, bns, act, train):
        cdt = self.compute_dtype
        if mask is not None:
            mf = jnp.expand_dims(mask, -1).astype(cdt)
            cnt = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
            # zero invalid slots so plain (unmasked) moments are the masked
            # moments; fuses into the producer's elementwise epilogue
            x = x.astype(cdt) * mf
        else:
            mf = None
            cnt = jnp.float32(np.prod(x.shape[:-1]))
            x = x.astype(cdt)

        red = tuple(range(x.ndim - 1))
        for lin, bn in zip(lins[:-1], bns):
            w, b = lin.kernel_bias()  # f32 params
            if x.shape[-1] != w.shape[0]:
                raise ValueError(
                    f"MLP expected {w.shape[0]} input features, got {x.shape[-1]}"
                )
            if train:
                # input moments: one reduce + one MXU matmul over x (invalid
                # slots are zero, so these ARE the masked moments); accumulate
                # in f32 for <=f32 compute, f64 under jax_enable_x64 tests
                acc = jnp.promote_types(cdt, jnp.float32)
                s1 = jnp.sum(x, axis=red, dtype=acc)  # (Cin,)
                m2 = jnp.einsum(
                    "...i,...j->ij", x, x, preferred_element_type=acc
                )  # (Cin, Cin)
                ba = b.astype(acc)  # params are f32; do the algebra in acc
                sw = s1 @ w.astype(acc)  # (Cout,)
                mean = sw / cnt + ba
                quad = jnp.einsum("ic,ic->c", w.astype(acc), m2 @ w.astype(acc))
                e2 = (quad + 2.0 * ba * sw) / cnt + ba * ba  # diag(WᵀM2W)/n + ...
                var = jnp.maximum(e2 - mean * mean, 0.0)
                bn.update_running(mean, var, cnt)
            else:
                mean, var = bn.running()
            scale, shift = bn.fold(mean, var)
            y = jnp.dot(
                x,
                (w * scale[None, :]).astype(cdt),
                preferred_element_type=jnp.promote_types(cdt, jnp.float32),
            )
            y = y + (b * scale + shift)
            if act is not None:
                y = act(y)
            if self.dropout > 0.0:
                y = nn.Dropout(self.dropout, deterministic=not train)(y)
            # keep the zero contract for the next layer's moments
            x = (y * mf if mf is not None else y).astype(cdt)
        return lins[-1](x)


class FusedSAMLP(nn.Module):
    """MLP([C0, C1, C2, C3]) + masked max over the neighbor axis, executed by
    the fused Pallas SA kernels (ops/pallas_sa_train.py).

    Creates the exact same parameter/variable tree as ``MLP`` (lin0/bn0/lin1/
    bn1/lin2) so checkpoints are interchangeable with the unfused path; the
    init pass runs the standard layer stack to build it.

    Input: ``dense`` (B, M, K=64, CD) wide edge features (or None) + ``planes``
    CP x (B, M, K) narrow channels + nbr_mask (B, M, K); W1's channel order is
    [dense..., planes...] (see ops/pallas_sa_train.py for why two forms).
    Output: pooled (B, M, C3) — what ``masked_max(MLP(...), axis=2)`` returns.
    """

    channels: Sequence[int]
    act: Optional[str] = "ReLU"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, dense, planes, nbr_mask, train: bool = False):
        from dl_biomass_tpu.ops.pallas_sa_train import fused_sa_mlp
        from dl_biomass_tpu.ops.pooling import masked_max

        chans = list(self.channels)
        if len(chans) != 4:
            raise ValueError(f"FusedSAMLP needs [C0, C1, C2, C3] channels, got {chans}")
        lin0 = Dense(chans[1], in_features=chans[0], compute_dtype=self.compute_dtype, name="lin0")
        bn0 = MaskedBatchNorm(num_features=chans[1], name="bn0")
        lin1 = Dense(chans[2], in_features=chans[1], compute_dtype=self.compute_dtype, name="lin1")
        bn1 = MaskedBatchNorm(num_features=chans[2], name="bn1")
        lin2 = Dense(chans[3], in_features=chans[2], compute_dtype=self.compute_dtype, name="lin2")

        if self.is_initializing():
            # standard stack builds the identical tree; shapes here are tiny
            parts = ([dense] if dense is not None else []) + [p[..., None] for p in planes]
            grouped = jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]
            act = resolve_activation(self.act)
            x = bn0(lin0(grouped), nbr_mask, use_running_average=False)
            x = act(x) if act is not None else x
            x = bn1(lin1(x), nbr_mask, use_running_average=False)
            x = act(x) if act is not None else x
            return masked_max(lin2(x), nbr_mask, axis=2)

        w1, b1 = lin0.kernel_bias()
        w2, b2 = lin1.kernel_bias()
        w3, b3 = lin2.kernel_bias()
        g1, be1 = bn0.params_()
        g2, be2 = bn1.params_()
        params = dict(w1=w1, b1=b1, gamma1=g1, beta1=be1,
                      w2=w2, b2=b2, gamma2=g2, beta2=be2, w3=w3, b3=b3)
        bf16 = jnp.dtype(self.compute_dtype) == jnp.dtype(jnp.bfloat16)
        if dense is not None:
            dense = dense.astype(self.compute_dtype)
        if train:
            out, (m1, v1, m2, v2) = fused_sa_mlp(
                dense, planes, nbr_mask, params, act=self.act, bf16=bf16, train=True
            )
            cnt = jnp.maximum(jnp.sum(nbr_mask.astype(jnp.float32)), 1.0)
            bn0.update_running(m1, v1, cnt)
            bn1.update_running(m2, v2, cnt)
            return out
        running = bn0.running() + bn1.running()
        return fused_sa_mlp(
            dense, planes, nbr_mask, params, running, act=self.act, bf16=bf16, train=False
        )
