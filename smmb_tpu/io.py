"""Format serialization (net-new; the reference persists nothing, SURVEY §5).

A ternary-weight framework needs a serving artifact format: ``save``/``load``
for every sparse format as a single .npz (portable, mmap-friendly), the
model-level save of packed MLP weights, and ``save_pytree``/``load_pytree``
for whole packed models (LM, MoE, blocks). Orbax handles training checkpoints of
fp32 masters (plain pytrees — nothing custom needed; round-trip covered by
tests/test_nn_io.py::test_orbax_training_checkpoint_roundtrip); this module
covers the packed/indexed serving artifacts.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from smmb_tpu.formats.bcsr import BCSR
from smmb_tpu.formats.packed import TernaryPacked
from smmb_tpu.formats.tcsc import TCSC

_KIND = {"TCSC": TCSC, "BCSR": BCSR, "TernaryPacked": TernaryPacked}


def save(path: str, obj) -> None:
    """Save a TCSC / BCSR / TernaryPacked matrix to ``path`` (.npz)."""
    kind = type(obj).__name__
    if kind not in _KIND:
        raise TypeError(f"unsupported format: {kind}")
    import dataclasses

    arrays, meta = {}, {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if isinstance(v, (int, float)):
            meta[f.name] = v
        else:
            arrays[f.name] = np.asarray(v)
    np.savez(
        path,
        __kind__=np.array(kind),
        __meta_names__=np.array(list(meta.keys())),
        __meta_values__=np.array([meta[k] for k in meta.keys()]),
        **arrays,
    )


def load(path: str):
    """Load a matrix saved by ``save``; arrays come back as device arrays."""
    z = np.load(path, allow_pickle=False)
    kind = str(z["__kind__"])
    cls = _KIND[kind]
    meta = {}
    for k, v in zip(z["__meta_names__"], z["__meta_values__"]):
        # preserve numeric type: int fields round-trip through float storage
        # exactly; anything non-integral stays float (never truncate)
        meta[str(k)] = int(v) if float(v) == int(v) else float(v)
    arrays = {
        k: jnp.asarray(z[k])
        for k in z.files
        if not k.startswith("__")
    }
    return cls(**arrays, **meta)


def save_packed_mlp(path: str, packed: dict) -> None:
    """Save a pack_mlp() result ({'w': [TernaryPacked...], 'b': [...],
    'scale': [...]})."""
    arrays = {}
    scales = packed.get("scale", [1.0] * len(packed["w"]))
    for i, (w, b, s) in enumerate(zip(packed["w"], packed["b"], scales)):
        arrays[f"w{i}_data"] = np.asarray(w.data)
        arrays[f"w{i}_meta"] = np.array([w.rows, w.cols, w.nnz])
        arrays[f"b{i}"] = np.asarray(b)
        arrays[f"s{i}"] = np.asarray(s, dtype=np.float32)
    arrays["n_layers"] = np.array(len(packed["w"]))
    np.savez(path, **arrays)


def load_packed_mlp(path: str) -> dict:
    z = np.load(path)
    n = int(z["n_layers"])
    out = {"w": [], "b": [], "scale": []}
    for i in range(n):
        rows, cols, nnz = (int(v) for v in z[f"w{i}_meta"])
        out["w"].append(
            TernaryPacked(
                data=jnp.asarray(z[f"w{i}_data"]), rows=rows, cols=cols, nnz=nnz
            )
        )
        out["b"].append(jnp.asarray(z[f"b{i}"]))
        out["scale"].append(
            jnp.asarray(z[f"s{i}"]) if f"s{i}" in z.files else jnp.float32(1.0)
        )
    return out


def save_pytree(path: str, tree) -> None:
    """Save any packed-model pytree (LM, MoE, transformer block, …) whose
    leaves are arrays/scalars. Static metadata (TernaryPacked rows/cols/nnz,
    dict keys, list lengths) lives in the pytree *structure* and is NOT
    stored — ``load_pytree`` takes a template that re-supplies it."""
    import jax

    leaves = jax.tree.leaves(tree)
    np.savez(
        path,
        __n_leaves__=np.array(len(leaves)),
        **{f"leaf{i}": np.asarray(v) for i, v in enumerate(leaves)},
    )


def load_pytree(path: str, template):
    """Load a ``save_pytree`` artifact into the structure of ``template``
    (e.g. ``pack_lm(init_lm(key, cfg))`` for an LM): leaf count and shapes
    must match; template leaf *values* are discarded."""
    import jax

    leaves, treedef = jax.tree.flatten(template)
    z = np.load(path, allow_pickle=False)
    n = int(z["__n_leaves__"])
    if n != len(leaves):
        raise ValueError(
            f"artifact has {n} leaves but template has {len(leaves)} — "
            "wrong template structure"
        )
    new = []
    for i, old in enumerate(leaves):
        arr = z[f"leaf{i}"]
        if tuple(arr.shape) != tuple(np.shape(old)):
            raise ValueError(
                f"leaf {i}: artifact shape {arr.shape} != template "
                f"{np.shape(old)}"
            )
        new.append(jnp.asarray(arr))
    return jax.tree.unflatten(treedef, new)


def save_params(path: str, params: dict) -> None:
    """Save an MLP master-weight pytree ({'w': [...], 'b': [...]}) — the
    training-side checkpoint counterpart of save_packed_mlp."""
    arrays = {}
    for i, (w, b) in enumerate(zip(params["w"], params["b"])):
        arrays[f"w{i}"] = np.asarray(w)
        arrays[f"b{i}"] = np.asarray(b)
    arrays["n_layers"] = np.array(len(params["w"]))
    np.savez(path, **arrays)


def load_params(path: str) -> dict:
    z = np.load(path)
    n = int(z["n_layers"])
    return {
        "w": [jnp.asarray(z[f"w{i}"]) for i in range(n)],
        "b": [jnp.asarray(z[f"b{i}"]) for i in range(n)],
    }
