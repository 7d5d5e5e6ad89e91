"""Row-partitioned CSR for device meshes.

No reference counterpart (the reference is single-core); this is component D1
of SURVEY.md §2. A :class:`ShardedCSR` splits rows into ``num_shards``
contiguous blocks of equal (padded) size and pads every shard's entry list to
the max shard nnz, so all three arrays stack to rectangular
``(num_shards, …)`` tensors shardable with ``NamedSharding(mesh,
P("rows"))``. Padding entries are appended to each shard's *last local row*
with value 0 / col 0 — they stay inside the local indptr invariant and
contribute nothing.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.csr import CSR
from .mesh import ROWS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedCSR:
    """Stacked per-shard CSR arrays. Leading dim = shard index, laid out over
    the ``"rows"`` mesh axis."""

    indptr: jax.Array    # (S, rows_per_shard + 1) int32, local offsets
    indices: jax.Array   # (S, nnz_max) int32
    values: jax.Array    # (S, nnz_max)
    rows: int = dataclasses.field(metadata=dict(static=True))
    cols: int = dataclasses.field(metadata=dict(static=True))
    rows_per_shard: int = dataclasses.field(metadata=dict(static=True))

    @property
    def num_shards(self) -> int:
        return int(self.indptr.shape[0])

    @property
    def padded_rows(self) -> int:
        return self.num_shards * self.rows_per_shard

    def local(self, s_indptr, s_indices, s_values) -> CSR:
        """Wrap one shard's (already-local) arrays as a CSR of shape
        (rows_per_shard, cols). For use inside ``shard_map`` bodies."""
        return CSR(
            indptr=s_indptr,
            indices=s_indices,
            values=s_values,
            rows=self.rows_per_shard,
            cols=self.cols,
        )


def shard_csr(a: CSR, num_shards: int) -> ShardedCSR:
    """Host-side row partition of ``a`` into ``num_shards`` equal blocks."""
    indptr, indices, values = a.numpy()
    rps = -(-a.rows // num_shards)  # rows per shard (ceil)
    nnz_per_shard = []
    bounds = []
    for s in range(num_shards):
        r0 = min(s * rps, a.rows)
        r1 = min((s + 1) * rps, a.rows)
        lo, hi = int(indptr[r0]), int(indptr[r1])
        bounds.append((r0, r1, lo, hi))
        nnz_per_shard.append(hi - lo)
    nnz_max = max(max(nnz_per_shard), 1)

    out_indptr = np.zeros((num_shards, rps + 1), dtype=np.int32)
    out_indices = np.zeros((num_shards, nnz_max), dtype=np.int32)
    out_values = np.zeros((num_shards, nnz_max), dtype=values.dtype)
    for s, (r0, r1, lo, hi) in enumerate(bounds):
        local = indptr[r0 : r1 + 1].astype(np.int64) - lo
        out_indptr[s, : r1 - r0 + 1] = local
        out_indptr[s, r1 - r0 :] = hi - lo  # trailing padded rows: empty
        out_indptr[s, rps] = nnz_max       # last row absorbs entry padding
        out_indices[s, : hi - lo] = indices[lo:hi]
        out_values[s, : hi - lo] = values[lo:hi]
    return ShardedCSR(
        indptr=jnp.asarray(out_indptr),
        indices=jnp.asarray(out_indices),
        values=jnp.asarray(out_values),
        rows=a.rows,
        cols=a.cols,
        rows_per_shard=rps,
    )


def put_sharded(sa: ShardedCSR, mesh: Mesh) -> ShardedCSR:
    """Place the stacked arrays so shard ``s`` lives on mesh position ``s``
    of the ``"rows"`` axis."""
    spec = NamedSharding(mesh, P(ROWS))
    return ShardedCSR(
        indptr=jax.device_put(sa.indptr, spec),
        indices=jax.device_put(sa.indices, spec),
        values=jax.device_put(sa.values, spec),
        rows=sa.rows,
        cols=sa.cols,
        rows_per_shard=sa.rows_per_shard,
    )


def unshard_rows(y_padded: jax.Array, rows: int) -> jax.Array:
    """Trim row padding introduced by the equal-block partition."""
    return y_padded[:rows]
