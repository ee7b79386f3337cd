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

import logging
import re

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

# Every Conformer encoder layer contributes exactly this many
# tensor-parallel kernels: ffn1/Dense_{0,1}, ffn2/Dense_{0,1},
# mha/{qkv_proj,out_proj}, conv/{pointwise_in,pointwise_out}.
TP_KERNELS_PER_CONFORMER_LAYER = 8


def make_mesh(dp=None, tp=1, sp=1, pp=1, devices=None):
    """Build a (data[, pipe][, seq], model) mesh over the devices.

    ``sp > 1`` adds a ``'seq'`` axis for sequence parallelism
    (``parallel/seq_parallel.py``: the encoder's time axis sharded with
    per-layer halo exchange); ``pp > 1`` adds a ``'pipe'`` axis for
    pipeline parallelism (``parallel/pp_parallel.py``: contiguous layer
    blocks per device, GPipe microbatch schedule). With the defaults
    the mesh keeps the historical two-axis (data, model) shape.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // (tp * sp * pp)
    if dp * tp * sp * pp != n:
        raise ValueError(
            f"dp ({dp}) * tp ({tp}) * sp ({sp}) * pp ({pp}) != device "
            f"count ({n})")
    dims = [("data", dp)]
    if pp > 1:
        dims.append(("pipe", pp))
    if sp > 1:
        dims.append(("seq", sp))
    dims.append(("model", tp))
    arr = np.asarray(devices).reshape([d for _, d in dims])
    return Mesh(arr, axis_names=tuple(name for name, _ in dims))


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


def tp_sharding_report(shardings):
    """Flat ``{path: PartitionSpec}`` split into (sharded, replicated)
    path lists, for logging which leaves actually ride the 'model' axis."""
    sharded, replicated = [], []
    for path, s in jax.tree_util.tree_leaves_with_path(
            shardings, is_leaf=lambda x: hasattr(x, "spec")):
        p = "/".join(str(getattr(x, "key", x)) for x in path)
        if "model" in str(s.spec):
            sharded.append(p)
        else:
            replicated.append(p)
    return sharded, replicated


def validate_tp_shardings(shardings, expected_layers=None):
    """Guard against flax name drift silently replicating TP leaves.

    The sharding rules in ``_tp_spec`` match parameter *names*; if a flax
    auto-name drifts, leaves fall back to replicated — a silent perf
    regression. This validator is anchored on the structural
    ``layer_<i>`` scope pattern instead: every Conformer layer scope must
    contribute exactly ``TP_KERNELS_PER_CONFORMER_LAYER`` model-sharded
    kernels. Raises ValueError on any shortfall (or if no layer scopes
    are found at all while TP > 1).

    Returns ``(sharded, replicated)`` path lists for logging.
    """
    sharded, replicated = tp_sharding_report(shardings)
    layer_re = re.compile(r"(^|/)((?:[\w.]+/)*layer_\d+)(/|$)")

    def layer_scope(path):
        m = layer_re.search(path)
        return m.group(2) if m else None

    all_scopes = {layer_scope(p) for p in sharded + replicated}
    all_scopes.discard(None)
    if not all_scopes:
        raise ValueError(
            "TP mesh requested but no Conformer 'layer_<i>' scopes found "
            "in the parameter tree — sharding rules cannot apply")
    if expected_layers is not None and len(all_scopes) != expected_layers:
        raise ValueError(
            f"expected {expected_layers} Conformer layer scopes, found "
            f"{len(all_scopes)}: {sorted(all_scopes)}")
    per_scope = {s: 0 for s in all_scopes}
    for p in sharded:
        s = layer_scope(p)
        if s is not None:
            per_scope[s] += 1
    bad = {s: n for s, n in per_scope.items()
           if n != TP_KERNELS_PER_CONFORMER_LAYER}
    if bad:
        raise ValueError(
            "TP sharding drift: these Conformer layers do not have "
            f"exactly {TP_KERNELS_PER_CONFORMER_LAYER} model-sharded "
            f"kernels (name drift in _tp_spec rules?): {bad}")
    return sharded, replicated


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
    """Host arrays -> device arrays sharded over the 'data' axis.

    Under a 'pipe' mesh axis the per-data-shard batch must also divide
    the GPipe microbatch count (``pp_parallel.pp_encoder_apply``,
    default n_micro = pipe size), so the batch pads to data*pipe."""
    dp = mesh.shape["data"] * mesh.shape.get("pipe", 1)
    padded = pad_batch_to(batch_arrays, dp)
    return {
        key: jax.device_put(value, batch_sharding(mesh, np.ndim(value)))
        for key, value in padded.items()
    }
