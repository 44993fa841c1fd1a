"""AOT serving export: freeze the folded serving graph into a portable artifact.

The reference's deployment story is ``torch.save(model)`` — a whole-module
pickle (``main.py:243-245``) that can only be loaded by a process carrying the
exact model source tree (``testing_model.py:30-37``). The TPU-native analog
built here is the opposite trade: the folded-weight serving computation
(models/inference.py) is serialized ahead-of-time as versioned StableHLO via
``jax.export``, with the folded weights riding alongside as plain arrays. A
serving host needs jax + numpy + this loader — no flax, no model class, no
training config, no checkpoint format — and StableHLO's compatibility window
makes the artifact durable across jax upgrades.

Artifact layout (a directory):

    serving.stablehlo   jax.export serialization of the flat serving function
    weights.npz         folded weights (arr_00000...), positional
    meta.json           shapes, dtypes, platforms, versions, model summary

The exported function takes ``(*weights, pos, feat, mask)`` as PLAIN arrays —
the weight pytree is flattened at export time — so the artifact is consumable
even without this package (``jax.export.deserialize(blob).call(...)``).

Shapes are static (one ``(batch_size, num_points)`` envelope per artifact):
the serving kernels are Pallas TPU kernels with shape-specialized grids, and
static shapes are also what makes the compiled executable reusable across
processes via the persistent compile cache. Export several envelopes if the
deployment needs several (the loader's ``predict`` chunks + pads any plot
count into the envelope, so one envelope serves most workflows).

Platform note: ``jax.export`` lowers for the platform(s) active at export
time — export on the serving platform (TPU for production). The loader
refuses a platform the artifact was not lowered for, with a clear error.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1

_SERVING_FILE = "serving.stablehlo"
_WEIGHTS_FILE = "weights.npz"
_META_FILE = "meta.json"


def export_serving(
    model,
    variables: dict,
    *,
    batch_size: int,
    num_points: int,
    path: str,
    platforms: Optional[Sequence[str]] = None,
) -> dict:
    """Export the folded serving computation for ``model`` to ``path``.

    ``num_points`` is the served point-axis size — the dataset CAPACITY
    (``round_up(base_n, 128)``, the shape ``DeviceDataset``/``CloudBatch``
    actually produce), not the nominal pre-pad count.

    ``platforms``: lowering targets (default: the current backend). Multi-
    platform artifacts (e.g. ``["tpu", "cpu"]``) are supported by jax.export
    but each platform must be lowerable from this process.

    Returns the metadata dict (also written to ``meta.json``).
    """
    from jax import export as jax_export

    from dl_biomass_tpu.core.cloud import CloudBatch
    from dl_biomass_tpu.models.inference import compile_inference

    serve = compile_inference(model, variables)
    infer, folded = serve._infer, serve._folded
    flat, treedef = jax.tree_util.tree_flatten(folded)
    n_weights = len(flat)
    num_features = int(model.num_features or 0)

    def flat_fn(*args):
        weights = jax.tree_util.tree_unflatten(treedef, args[:n_weights])
        pos, feat, mask = args[n_weights:]
        batch = CloudBatch(pos=pos, feat=feat, mask=mask, y=None)
        return infer(weights, batch)

    specs = tuple(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in flat) + (
        jax.ShapeDtypeStruct((batch_size, num_points, 3), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, num_points, num_features), jnp.float32),
        jax.ShapeDtypeStruct((batch_size, num_points), jnp.bool_),
    )
    exported = jax_export.export(
        jax.jit(flat_fn),
        platforms=list(platforms) if platforms is not None else None,
    )(*specs)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _SERVING_FILE), "wb") as f:
        f.write(exported.serialize())
    np.savez(
        os.path.join(path, _WEIGHTS_FILE),
        **{f"arr_{i:05d}": np.asarray(a) for i, a in enumerate(flat)},
    )
    meta = {
        "format": FORMAT_VERSION,
        "batch_size": int(batch_size),
        "num_points": int(num_points),
        "num_features": num_features,
        "num_outputs": int(model.num_outputs),
        "n_weights": n_weights,
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "model_summary": {
            "family": type(model).__name__,
            "compute_dtype": str(jnp.dtype(model.compute_dtype).name),
            "fast_fps": bool(model.fast_fps),
            "fast_group": bool(model.fast_group),
            "use_pallas": bool(model.use_pallas),
            "exact_selection": bool(model.exact_selection),
        },
    }
    with open(os.path.join(path, _META_FILE), "w") as f:
        json.dump(meta, f, indent=1)
    return meta


class ExportedServing:
    """A loaded serving artifact: ``fn(pos, feat, mask) -> (B, outputs)``.

    ``__call__`` is strict (arrays must match the exported envelope exactly);
    ``predict`` serves ANY number of plots by chunking to the envelope batch
    and padding the tail with masked-out clouds (all dispatches are queued
    before the first device->host sync — per-dispatch latency is real on a
    tunneled backend, see docs/DESIGN.md §7).
    """

    def __init__(self, path: str):
        from jax import export as jax_export

        with open(os.path.join(path, _META_FILE)) as f:
            self.meta = json.load(f)
        if self.meta.get("format", 0) > FORMAT_VERSION:
            raise ValueError(
                f"artifact format {self.meta['format']} is newer than this "
                f"loader (supports <= {FORMAT_VERSION}) — upgrade the package"
            )
        backend = jax.default_backend()
        if backend not in self.meta["platforms"]:
            raise RuntimeError(
                f"artifact at {path!r} was lowered for {self.meta['platforms']} "
                f"but this process runs on {backend!r} — re-export on this "
                f"platform (export-model) or run where the artifact targets"
            )
        with open(os.path.join(path, _SERVING_FILE), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        with np.load(os.path.join(path, _WEIGHTS_FILE)) as z:
            self._weights = [
                jnp.asarray(z[f"arr_{i:05d}"]) for i in range(self.meta["n_weights"])
            ]
        self.batch_size = int(self.meta["batch_size"])
        self.num_points = int(self.meta["num_points"])
        self.num_features = int(self.meta["num_features"])
        self.num_outputs = int(self.meta["num_outputs"])

    def __call__(self, pos, feat, mask):
        b, n, f = self.batch_size, self.num_points, self.num_features
        if tuple(pos.shape) != (b, n, 3) or tuple(feat.shape) != (b, n, f) \
                or tuple(mask.shape) != (b, n):
            raise ValueError(
                f"envelope mismatch: artifact serves pos ({b}, {n}, 3) / feat "
                f"({b}, {n}, {f}) / mask ({b}, {n}); got {tuple(pos.shape)} / "
                f"{tuple(feat.shape)} / {tuple(mask.shape)} — use .predict() "
                "for arbitrary plot counts, or re-export for this envelope"
            )
        return self._exported.call(
            *self._weights,
            jnp.asarray(pos, jnp.float32),
            jnp.asarray(feat, jnp.float32),
            jnp.asarray(mask, bool),
        )

    def predict(self, pos, feat, mask) -> np.ndarray:
        """Serve (P, N, ...) arrays for any P; returns (P, num_outputs) f32."""
        p = pos.shape[0]
        if pos.shape[1] != self.num_points:
            raise ValueError(
                f"artifact serves num_points={self.num_points}; got clouds "
                f"with {pos.shape[1]} point slots — resample/pad to match, "
                "or re-export for this envelope"
            )
        b = self.batch_size
        outs = []
        for s in range(0, p, b):  # queue every dispatch, sync once at the end
            pc, fc, mc = pos[s : s + b], feat[s : s + b], mask[s : s + b]
            pad = b - pc.shape[0]
            if pad:
                pc = np.concatenate([pc, np.zeros((pad,) + pc.shape[1:], np.float32)])
                fc = np.concatenate([fc, np.zeros((pad,) + fc.shape[1:], np.float32)])
                mc = np.concatenate([mc, np.zeros((pad,) + mc.shape[1:], bool)])
            outs.append(self(pc, fc, mc))
        flat = np.concatenate([np.asarray(o, np.float32) for o in outs])
        return flat[:p]


def load_serving(path: str) -> ExportedServing:
    """Load an artifact written by ``export_serving`` (or CLI ``export-model``)."""
    return ExportedServing(path)
