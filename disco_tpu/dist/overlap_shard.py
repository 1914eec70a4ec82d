"""Multi-chip overlap superstep over a jax.sharding.Mesh.

TPU-native replacement for the reference's two distribution modes:

- BuildGraphMPI (replicated index, partitioned reads,
  reference: src/BuildGraphMPI/src/OverlapGraph.cpp:294-295): the query axis
  is sharded over the mesh ("dp"), reads replicated.
- BuildGraphMPIRMA (partitioned hash data + passive-target MPI_Get with
  software caches, reference: src/BuildGraphMPIRMA/src/HashTable.cpp:92-119,
  648-708): the fingerprint table is HASH-SHARDED by key
  (owner = key mod n_shards) and each superstep routes query k-mers to their
  owner shard with one fused `all_to_all`; answers return the same way —
  bulk-synchronous exchange instead of latency-bound one-sided Gets
  (SURVEY.md §5.8).
- The reference's async marked-bitmap gossip
  (BuildGraphMPI/src/OverlapGraph.cpp:204-290) becomes a synchronous
  `all_gather`/`pmax` per superstep.

Everything is static-shape: queries are binned into fixed-capacity per-peer
blocks (overflow is counted and reported so the host can re-run those
windows), hits are capped per query at `hit_cap` with validity masks.  The
superstep returns the full verified-hit grids so a distributed buildG can
assemble the same relation (and therefore the same output files) as the
single-chip path.
"""
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..index.table import FingerprintTable
from ..io.readstore import ReadStore
from ..overlap.device import candidate_checks

AXIS = "dp"


def _bin_by_owner(owner, n_bins, cap):
    """Scatter indices [0, Q) into an (n_bins, cap) slot matrix by owner id.
    Returns (slots int32, -1 padding; overflow count). Overflowing entries
    are dropped via an out-of-bounds row index."""
    q = owner.shape[0]
    order = jnp.argsort(owner, stable=True)
    sowner = owner[order].astype(jnp.int32)
    start = jnp.searchsorted(sowner, jnp.arange(n_bins, dtype=jnp.int32))
    rank = jnp.arange(q, dtype=jnp.int32) - start[sowner]
    valid = rank < cap
    row = jnp.where(valid, sowner, n_bins)          # OOB row -> dropped
    col = jnp.where(valid, rank, 0)
    slots = jnp.full((n_bins, cap), -1, jnp.int32)
    slots = slots.at[row, col].set(order.astype(jnp.int32), mode="drop")
    overflow = q - valid.sum()
    return slots, overflow


@dataclass
class ShardedOverlapEngine:
    """Device-sharded candidate lookup + verification.

    Host-side setup shards the sorted fingerprint table by key ownership
    (key mod n_shards) and pads shards to equal length; the device superstep
    does bin -> all_to_all -> local searchsorted -> all_to_all -> verify."""
    mesh: Mesh
    n_words: int
    k: int
    hit_cap: int
    route_cap: int
    keys: np.ndarray    # (n_shards, M_pad) uint64, each row sorted
    read: np.ndarray    # (n_shards, M_pad) int32
    orient: np.ndarray  # (n_shards, M_pad) int32
    typ: np.ndarray     # (n_shards, M_pad) int32
    sizes: np.ndarray   # (n_shards,) int32 — real (unpadded) entry counts

    @classmethod
    def build(cls, store: ReadStore, table: FingerprintTable, mesh: Mesh,
              hit_cap: int = 8, route_cap: int = 4096) -> "ShardedOverlapEngine":
        n_shards = mesh.devices.size
        owner = (table.keys % np.uint64(n_shards)).astype(np.int64)
        m_pad = max(int(np.bincount(owner, minlength=n_shards).max()), 1)
        keys = np.full((n_shards, m_pad), np.uint64(0xFFFFFFFFFFFFFFFF))
        read = np.zeros((n_shards, m_pad), np.int32)
        orient = np.zeros((n_shards, m_pad), np.int32)
        typ = np.zeros((n_shards, m_pad), np.int32)
        sizes = np.zeros(n_shards, np.int32)
        for s in range(n_shards):
            sel = owner == s
            m = int(sel.sum())
            keys[s, :m] = table.keys[sel]   # globally sorted => row sorted
            read[s, :m] = table.read[sel]
            orient[s, :m] = table.orient[sel]
            typ[s, :m] = table.typ[sel]
            sizes[s] = m
        return cls(mesh=mesh, n_words=store.n_words, k=table.k,
                   hit_cap=hit_cap, route_cap=route_cap,
                   keys=keys, read=read, orient=orient, typ=typ, sizes=sizes)

    # ------------------------------------------------------------------
    def _superstep(self, packed_all, lengths, qread, qj, qcode, marked,
                   lkeys, lread, lorient, ltyp, lsize):
        """Per-shard body (runs under shard_map).  Local (per-shard query
        slice) outputs: hit grids (Qs, H), overflow (1,), marked union."""
        n_shards = jax.lax.psum(1, AXIS)
        hit_cap = self.hit_cap
        route_cap = self.route_cap
        q_local = qread.shape[0]

        # 1. union of marked bitmaps (replaces async gossip)
        marked_union = jax.lax.all_gather(marked, AXIS, tiled=True)

        # 2. route query codes to their owner shards
        owner = (qcode % jnp.uint64(n_shards)).astype(jnp.int32)
        slots, overflow = _bin_by_owner(owner, n_shards, route_cap)
        slot_valid = slots >= 0
        q_idx = jnp.clip(slots, 0)
        codes_out = jnp.where(slot_valid, qcode[q_idx], jnp.uint64(0))
        codes_in = jax.lax.all_to_all(codes_out, AXIS, 0, 0, tiled=True)
        valid_in = jax.lax.all_to_all(slot_valid, AXIS, 0, 0, tiled=True)

        # 3. local table lookup — clamped to the shard's REAL entry count:
        #    the pad entries share the key 0xFF..FF, which a genuine poly-T
        #    window can also hash to, so an unclamped hi would sweep the
        #    pad run into that query's bucket (garbage hits / spurious
        #    hit-cap overflow)
        flat_codes = codes_in.reshape(-1)
        lo = jnp.minimum(jnp.searchsorted(lkeys, flat_codes, side="left"),
                         lsize)
        hi = jnp.minimum(jnp.searchsorted(lkeys, flat_codes, side="right"),
                         lsize)
        tpos = lo[:, None] + jnp.arange(hit_cap, dtype=lo.dtype)[None, :]
        hit_valid = (tpos < hi[:, None]) & valid_in.reshape(-1)[:, None]
        overflow = overflow + ((hi - lo) > hit_cap).sum()
        tpos = jnp.clip(tpos, 0, lkeys.shape[0] - 1)
        hit_read = jnp.where(hit_valid, lread[tpos], 0).astype(jnp.int32)
        hit_orient = jnp.where(hit_valid, lorient[tpos], 0).astype(jnp.int32)
        hit_typ = jnp.where(hit_valid, ltyp[tpos], 0).astype(jnp.int32)

        # 4. answers ride back to the querying shard
        def back(x):
            return jax.lax.all_to_all(
                x.reshape(n_shards, route_cap, hit_cap), AXIS, 0, 0,
                tiled=True).reshape(n_shards * route_cap, hit_cap)

        hit_read = back(hit_read)
        hit_orient = back(hit_orient)
        hit_typ = back(hit_typ)
        pair_valid = back(hit_valid)

        # 5. scatter answers back to per-query rows (the slot matrix is the
        #    routing permutation)
        flat_slots = slots.reshape(-1)
        sel = flat_slots >= 0
        # unused slots scatter to an out-of-bounds row (dropped) so they
        # cannot clobber query row 0
        src = jnp.where(sel, flat_slots, q_local)
        r2 = jnp.zeros((q_local, hit_cap), jnp.int32)
        orient = jnp.zeros((q_local, hit_cap), jnp.int32)
        typ = jnp.zeros((q_local, hit_cap), jnp.int32)
        valid = jnp.zeros((q_local, hit_cap), jnp.bool_)
        r2 = r2.at[src].set(hit_read, mode="drop")
        orient = orient.at[src].set(hit_orient, mode="drop")
        typ = typ.at[src].set(hit_typ, mode="drop")
        valid = valid.at[src].set(pair_valid, mode="drop")

        # 6. verify locally (shared geometry, reference:
        #    src/BuildGraph/src/OverlapGraph.cpp:517-595)
        edge_ok, cont_ok = candidate_checks(
            packed_all, lengths, qread, qj, r2, orient, valid,
            k=self.k, n_words=self.n_words)
        return (r2, orient, typ, edge_ok, cont_ok, overflow[None],
                marked_union[None, :])

    def make_step(self):
        """Returns a jitted SPMD step over the mesh.
        step(packed_all, lengths, qread, qj, qcode, marked) ->
          (r2, orient, typ, edge_ok, cont_ok) per-query grids (Q, H),
          overflows (n_shards,), marked unions (n_shards, N)."""
        mesh = self.mesh
        keys = jnp.asarray(self.keys)
        read = jnp.asarray(self.read)
        orient = jnp.asarray(self.orient)
        typ = jnp.asarray(self.typ)
        sizes = jnp.asarray(self.sizes)

        def body(packed_all, lengths, qread, qj, qcode, marked,
                 keys_s, read_s, orient_s, typ_s, size_s):
            return self._superstep(packed_all, lengths, qread, qj, qcode,
                                   marked, keys_s[0], read_s[0], orient_s[0],
                                   typ_s[0], size_s[0])

        fn = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                      P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS),
                       P(AXIS), P(AXIS)),
            check_vma=False)

        @jax.jit
        def run(packed_all, lengths, qread, qj, qcode, marked):
            return fn(packed_all, lengths, qread, qj, qcode, marked,
                      keys, read, orient, typ, sizes)
        return run
