"""Device mesh construction and sharding rules.

The reference's only scale-out strategy is DDP data parallelism over NCCL
(``core.py:1464-1490``, ``utils/distributed.py:123-201``). Here the whole
train step is one SPMD program over a ``jax.sharding.Mesh`` with axes:

- ``data``  — batch axis (the DP ring over ICI; gradient mean becomes an
              XLA-inserted psum, the reference's bucketed allreduce);
- ``model`` — tensor-parallel axis for the large FFN / joint matmuls
              (capability the reference lacks; defaults to 1).

Sharding is annotated with ``NamedSharding`` on the jitted step's inputs;
XLA propagates layouts and inserts collectives (no hand-written NCCL
calls to translate).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp=None, tp=1, devices=None):
    """Build a (data, model) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp ({dp}) * tp ({tp}) != device count ({n})")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh, ndim=1):
    """Shard the leading (batch) dim over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *(None,) * (ndim - 1)))


def replicated(mesh):
    return NamedSharding(mesh, P())


def _tp_spec(path_str, leaf, tp_size):
    """Tensor-parallel spec for one parameter leaf.

    Strategy (Megatron-style pairing so no resharding is needed between
    the two FFN matmuls): first FFN / joint projections split the output
    dim; second projections split the input dim; everything small is
    replicated. Only shards dims divisible by tp_size.
    """
    if tp_size <= 1 or leaf.ndim < 2:
        return P()
    rows, cols = leaf.shape[-2], leaf.shape[-1]
    lower = path_str.lower()
    col_split = any(k in lower for k in
                    ("ffn1/dense_0", "ffn2/dense_0", "qkv_proj",
                     "pointwise_in"))
    row_split = any(k in lower for k in
                    ("ffn1/dense_1", "ffn2/dense_1", "out_proj",
                     "pointwise_out"))
    if col_split and cols % tp_size == 0:
        return P(*(None,) * (leaf.ndim - 1), "model")
    if row_split and rows % tp_size == 0:
        return P(*(None,) * (leaf.ndim - 2), "model", None)
    return P()


def param_shardings(params, mesh):
    """Pytree of NamedShardings for a parameter pytree."""
    tp_size = mesh.shape["model"]

    def spec_for(path, leaf):
        path_str = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(mesh, _tp_spec(path_str, leaf, tp_size))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def pad_batch_to(batch_arrays, multiple):
    """Pad the batch dim by duplicating trailing examples so it divides
    the data axis (the reference DDP pads by duplication too,
    ``DistributedSamplerWrapper``; duplicates are deduped at metric
    merge). The ``weight`` entry is zeroed for duplicated rows so the
    sharded loss/gradients equal the unsharded ones on non-divisible
    batches."""
    out = {}
    b = None
    for key, value in batch_arrays.items():
        arr = np.asarray(value)
        b = arr.shape[0] if b is None else b
        target = -(-b // multiple) * multiple
        if target != b:
            reps = np.concatenate(
                [arr, arr[: target - b]], axis=0) if target - b <= b else \
                np.concatenate([arr] * (-(-target // b)), axis=0)[:target]
            if key == "weight":
                reps = reps.copy()
                reps[b:] = 0
            out[key] = reps
        else:
            out[key] = arr
    return out


def shard_batch(batch_arrays, mesh):
    """Host arrays -> device arrays sharded over the 'data' axis."""
    dp = mesh.shape["data"]
    padded = pad_batch_to(batch_arrays, dp)
    return {
        key: jax.device_put(value, batch_sharding(mesh, np.ndim(value)))
        for key, value in padded.items()
    }
