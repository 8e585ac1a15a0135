"""Column-sharded bit-slice search over a device mesh (shard_map + ICI).

The signature matrix [filter_len, W] is sharded along the packed-filter
axis ("filters"); query slice indices are sharded along the batch axis
("data") and replicated across filter shards. Each device gathers its
local slice words, reduces across seeds/k-mers locally, and the per-shard
hit vectors are merged with an all_gather over the filters axis -- the
TPU equivalent of concatenating per-database-file hit lists in the
reference (kwage.cpp:154-177).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.search import (
    complete_kernel as _complete_kernel,
    counts_kernel as _counts_kernel,
    db_bytes_to_words,
    make_query_batch,
    unpack_mask,
)


def _sharded(fn, mesh: Mesh):
    # Per-query hit vectors are naturally sharded: the query axis follows
    # "data" and the packed-filter axis follows "filters" -- no collective
    # is needed at all (the concatenation of shard outputs IS the global
    # result). XLA reassembles the global array from the out_specs.
    return jax.jit(
        jax.shard_map(
            fn,
            mesh=mesh,
            in_specs=(P(None, "filters"), P("data", None, None), P("data", None)),
            out_specs=P("data", "filters"),
        )
    )


def _total_hits_kernel(db_local, idx, kmer_valid, threshold_count):
    """Per-query TOTAL matching-filter count across the whole corpus: the
    per-shard reduction rides a psum over the "filters" ICI axis (the
    analog of the reference's MPI_Allreduce(SUM) reconciliations,
    SriRachA/main.cpp:535-550)."""
    counts = _counts_kernel(db_local, idx, kmer_valid)   # [nq_local, Wl*32]
    local = (counts >= threshold_count[:, None]).sum(axis=1).astype(jnp.int32)
    return jax.lax.psum(local, axis_name="filters")


def sharded_total_hits(mesh: Mesh, db, idx, kmer_valid, threshold_count):
    """int32 [nq]: number of filters meeting the per-query threshold,
    reduced across all filter shards on-device."""
    fn = jax.jit(
        jax.shard_map(
            _total_hits_kernel,
            mesh=mesh,
            in_specs=(
                P(None, "filters"),
                P("data", None, None),
                P("data", None),
                P("data"),
            ),
            out_specs=P("data"),
        )
    )
    return fn(db, idx, kmer_valid, threshold_count)


def sharded_search_counts(mesh: Mesh, db, idx, kmer_valid):
    return _sharded(_counts_kernel, mesh)(db, idx, kmer_valid)


def sharded_search_complete(mesh: Mesh, db, idx, kmer_valid):
    return _sharded(_complete_kernel, mesh)(db, idx, kmer_valid)


class ShardedDatabase:
    """One BloomParam group of the corpus, sharded across a device mesh.

    Filters from many database files (same shape) are concatenated along
    the packed-word axis and placed with a NamedSharding over the
    "filters" mesh axis; queries are batched over "data".
    """

    def __init__(self, mesh: Mesh, param, slices: np.ndarray, num_filter: int):
        self.mesh = mesh
        self.param = param
        self.num_filter = num_filter
        words = db_bytes_to_words(slices)
        n_shards = mesh.shape["filters"]
        pad = (-words.shape[1]) % n_shards
        if pad:
            words = np.pad(words, ((0, 0), (0, pad)))
        self.W = words.shape[1]
        self.db = jax.device_put(
            words, NamedSharding(mesh, P(None, "filters"))
        )
        self._counts = _sharded(_counts_kernel, mesh)
        self._complete = _sharded(_complete_kernel, mesh)

    def _prep(self, queries: list[str]):
        idx, valid, nk = make_query_batch(
            queries,
            self.param.kmer_len,
            self.param.num_hash,
            self.param.log_2_filter_len,
        )
        # Bucket both query-batch axes (serving calls arrive with varying
        # sizes; every distinct shape is a separate XLA compile), then pad
        # the batch to a multiple of the data axis.
        n_data = self.mesh.shape["data"]
        nq_b = max(n_data, 1 << int(np.ceil(np.log2(max(idx.shape[0], 1)))))
        nq_b += (-nq_b) % n_data
        nk_b = max(128, ((idx.shape[1] + 127) // 128) * 128)
        pad_q = nq_b - idx.shape[0]
        pad_k = nk_b - idx.shape[1]
        if pad_q or pad_k:
            idx = np.pad(idx, ((0, pad_q), (0, pad_k), (0, 0)))
            valid = np.pad(valid, ((0, pad_q), (0, pad_k)))
        spec_idx = NamedSharding(self.mesh, P("data", None, None))
        spec_valid = NamedSharding(self.mesh, P("data", None))
        return (
            jax.device_put(idx, spec_idx),
            jax.device_put(valid, spec_valid),
            nk,
        )

    def search_counts(self, queries: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Per-filter hit counts int [nq, num_filter] + per-query k-mer counts."""
        idx, valid, nk = self._prep(queries)
        counts = np.asarray(self._counts(self.db, idx, valid))
        return counts[: len(queries), : self.num_filter], nk

    def total_hits(self, queries: list[str], threshold: float) -> np.ndarray:
        """Per-query corpus-wide matching-filter totals (psum over the
        "filters" ICI axis). threshold must be > 0 so zero-count padding
        columns never match."""
        from ..search.engine import query_threshold_count

        idx, valid, nk = self._prep(queries)
        qt = np.ones(idx.shape[0], dtype=np.int32)  # padding queries: qt=1
        for i in range(len(queries)):
            qt[i] = max(query_threshold_count(threshold, int(nk[i])), 1)
        totals = np.asarray(
            sharded_total_hits(self.mesh, self.db, idx, valid,
                               jax.device_put(qt, NamedSharding(self.mesh, P("data"))))
        )
        return totals[: len(queries)]

    def search_complete(self, queries: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Complete-match bool mask [nq, num_filter] + per-query k-mer counts."""
        idx, valid, nk = self._prep(queries)
        mask_words = np.asarray(self._complete(self.db, idx, valid))
        return unpack_mask(mask_words[: len(queries)], self.num_filter), nk
