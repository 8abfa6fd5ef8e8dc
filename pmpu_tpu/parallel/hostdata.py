"""Per-host sharded data loading for multi-host (DCN) data parallelism.

SURVEY.md §2.2 (DP row): the TPU-native equivalent of distributed data
loading is "per-host data loading sharded by ``jax.process_index()``" —
the reference itself is single-process (``train.py:231``) and has nothing
to port, so this is designed JAX-first:

* every host reads only the NIfTI headers of the full dataset (to agree on
  the global pad-to-cube size), then loads ONLY its round-robin shard of
  the volumes (``host_volume_names`` → ``load_host_store``);
* each host builds (scan, view, slice) triples over its LOCAL volumes and
  contributes them as its process-local shard of a single global batch
  array (``make_global_batch`` — ``jax.make_array_from_process_local_data``
  over the 'data' mesh axis), so the jitted DP train step consumes one
  logical batch while no host ever holds another host's data;
* the volume stacks themselves stay host-local: the step's gather runs on
  each host's addressable devices against that host's stack.

Single-host this degrades to the ordinary path (shard = everything),
which is how the multi-process-shaped CPU tests pin the semantics
(``tests/test_hostdata.py``).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def host_volume_names(all_names, process_index: int | None = None,
                      process_count: int | None = None) -> list:
    """Round-robin shard of the (sorted) volume file names for one host.
    Every host calls this with identical ``all_names``; the union over
    hosts is exactly the dataset and shards are disjoint."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    names = sorted(all_names)
    return names[pi::pc]


def global_cube(imgs_dir: str, names=None) -> int:
    """Global pad-to-cube size from NIfTI headers only (no voxel IO) —
    every host must pad to the same cube regardless of which volumes it
    loads."""
    from pmpu_tpu.data import nifti

    names = sorted(names if names is not None else os.listdir(imgs_dir))
    return int(
        max(max(nifti.read_header(os.path.join(imgs_dir, n)).shape[:3]) for n in names)
    )


def load_host_store(imgs_dir: str, masks_dir: str, process_index: int | None = None,
                    process_count: int | None = None):
    """This host's shard of the dataset as a VolumeStore, padded to the
    GLOBAL cube so all hosts' stacks are shape-compatible."""
    from pmpu_tpu.data.volumes import VolumeStore

    all_names = sorted(os.listdir(imgs_dir))
    mine = host_volume_names(all_names, process_index, process_count)
    if not mine:
        raise ValueError(
            f"host {process_index}/{process_count}: no volumes "
            f"(dataset has {len(all_names)})"
        )
    return VolumeStore.from_dirs(
        imgs_dir, masks_dir, names=mine, cube=global_cube(imgs_dir, all_names)
    )


class ShardedTripleBatcher:
    """Epoch batching for a volume pool sharded over the 'data' mesh axis
    (each shard owns a contiguous block of ``n_volumes // n_shards`` scans —
    device-level locally, host-level in multi-host jobs).

    Takes (scan, view, slice) triples with GLOBAL scan ids, partitions them
    by owning shard, and yields per-step (n_shards * per_shard, 3) batches
    in shard order with scan ids LOCALIZED to each shard's sub-stack —
    exactly the layout ``make_hostlocal_dp_train_step`` consumes (row block
    k lands on shard k, whose gather is then purely local). Per-shard
    shuffling each epoch; drop-last semantics (steps/epoch = the smallest
    shard's count, the standard distributed-sampler tradeoff).

    ``pad=True`` (validation): shards are instead equalized UP by cycling
    their rows so every row is seen at least once per epoch — unbalanced
    shards repeat a few rows rather than silently dropping whole shards
    (matters for small validation splits)."""

    def __init__(self, triples: np.ndarray, n_volumes: int, n_shards: int, pad: bool = False):
        if n_volumes % n_shards:
            raise ValueError(f"{n_volumes} volumes not divisible by {n_shards} shards")
        self.n_shards = n_shards
        self.pad = pad
        self.vols_per_shard = n_volumes // n_shards
        triples = np.asarray(triples)
        owner = triples[:, 0] // self.vols_per_shard
        self.shard_rows = []
        for k in range(n_shards):
            rows = triples[owner == k].copy()
            rows[:, 0] -= k * self.vols_per_shard  # globalize → localize
            self.shard_rows.append(rows)
        # real (pre-pad) row count per shard: the weight for the eval
        # step's weighted psum — a shard whose rows are ALL fabricated
        # (empty shard padded with sentinel rows below) must contribute
        # zero to the reported validation loss/dice
        self.shard_real_rows = np.array([len(r) for r in self.shard_rows], np.float32)
        if pad:
            target = max(max(len(r) for r in self.shard_rows), 1)
            padded = []
            for k, rows in enumerate(self.shard_rows):
                if len(rows) == 0:
                    # a rowless shard cannot borrow rows (scan ids are
                    # shard-local): run local scan 0/view 0/slice 0 as a
                    # sentinel batch; shard_real_rows[k] == 0 zero-weights
                    # its metrics
                    rows = np.zeros((target, 3), np.int32)
                elif len(rows) < target:
                    reps = -(-target // len(rows))
                    rows = np.tile(rows, (reps, 1))[:target]
                padded.append(rows)
            self.shard_rows = padded

    def steps_per_epoch(self, per_shard: int) -> int:
        m = min(len(r) for r in self.shard_rows)
        if self.pad:
            # ceil: the tail batch cycles back through the permutation so
            # every row is seen at least once even when the shard length is
            # below (or not a multiple of) per_shard — never 0 steps
            return -(-m // per_shard)
        return m // per_shard  # drop-last over the smallest shard

    def epoch_batches(self, per_shard: int, rng: np.random.Generator):
        """Yield (n_shards * per_shard, 3) int32 arrays, shard-ordered."""
        perms = [rng.permutation(len(r)) for r in self.shard_rows]
        for i in range(self.steps_per_epoch(per_shard)):
            idx = np.arange(i * per_shard, (i + 1) * per_shard)
            chunks = [
                self.shard_rows[k][
                    perms[k].take(idx, mode="wrap") if self.pad
                    else perms[k][idx]
                ]
                for k in range(self.n_shards)
            ]
            yield np.concatenate(chunks).astype(np.int32)


def make_global_batch(mesh: Mesh, local_rows: np.ndarray, axis: str = "data"):
    """Assemble one global batch array from each process's local rows.

    ``local_rows``: this host's (B_local, ...) contribution (e.g. triple
    rows into its local volume stack). Returns a global jax.Array sharded
    over ``axis`` whose global shape is (B_local * process_count, ...);
    each host's rows land on its own addressable devices, so the jitted
    step's gather only ever touches host-local data."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local_rows)
    )
