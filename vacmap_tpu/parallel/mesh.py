"""Device mesh and sharding for batched mapping.

The reference's only parallelism is single-host multiprocessing over
reads (vacmap:390-420).  Here the equivalent is SPMD data parallelism
over a `jax.sharding.Mesh`: read batches are sharded along the 'dp'
axis, the chaining/extension kernels run pjit-ted over the mesh, and
reads never need cross-device communication on the hot path (psum only
for throughput counters).  Multi-host runs extend the same mesh over
processes via jax.distributed.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


@dataclasses.dataclass
class ShardedChainStep:
    """The batched chaining step jitted over a mesh: inputs sharded on the
    batch ('dp') axis, outputs likewise; also returns a psum'd count of
    accepted chains as the cross-device reduction of the step."""

    mesh: Mesh
    kmersize: int = 15
    maxdiff: int = 50
    maxgap: int = 1000
    skipcost: float = 40.0
    variant: str = "global"
    accept_score: float = 60.0

    def __post_init__(self):
        from ..ops.chain_jax import chain_scores_batch

        mesh = self.mesh
        batch_sharding = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())

        def step(anchors, n_valid, skip_i, maxdiff_i):
            S, Pp = chain_scores_batch(
                anchors, n_valid, skip_i, maxdiff_i,
                kmersize=self.kmersize, maxdiff=self.maxdiff,
                maxgap=self.maxgap, skipcost=self.skipcost,
                variant=self.variant,
            )
            best = jnp.max(S, axis=1)
            n_accepted = jnp.sum((best > self.accept_score).astype(jnp.int32))
            return S, Pp, best, n_accepted

        self._fn = jax.jit(
            step,
            in_shardings=(batch_sharding, batch_sharding, batch_sharding, batch_sharding),
            out_shardings=(batch_sharding, batch_sharding, batch_sharding, rep),
        )
        self.batch_sharding = batch_sharding

    def pad_batch(self, anchors, n_valid, skip_i, maxdiff_i):
        """Pad batch dim to a multiple of the mesh size."""
        n = self.mesh.devices.size
        B = anchors.shape[0]
        Bp = int(np.ceil(B / n)) * n
        if Bp != B:
            pad = ((0, Bp - B),)
            anchors = np.pad(anchors, pad + ((0, 0), (0, 0)))
            n_valid = np.pad(n_valid, pad)
            skip_i = np.pad(skip_i, pad + ((0, 0),))
            maxdiff_i = np.pad(maxdiff_i, pad + ((0, 0),))
        return anchors, n_valid, skip_i, maxdiff_i, B

    def __call__(self, anchors, n_valid, skip_i, maxdiff_i):
        anchors, n_valid, skip_i, maxdiff_i, B = self.pad_batch(
            anchors, n_valid, skip_i, maxdiff_i
        )
        S, Pp, best, n_acc = self._fn(anchors, n_valid, skip_i, maxdiff_i)
        return (
            np.asarray(S)[:B],
            np.asarray(Pp)[:B],
            np.asarray(best)[:B],
            int(n_acc),
        )


@dataclasses.dataclass
class ShardedMappingStep:
    """The FULL device side of the mapping pipeline jitted over the mesh:
    global chain DP -> local (fine) re-chain DP -> batched affine fill —
    every device kernel the production pipeline uses, sharded dp over the
    batch axis in ONE jit.  Host glue (backtrack, harvest, SAM) runs
    between production calls; here the kernels chain directly so the
    dryrun proves the whole device step compiles and executes under an
    n-device mesh (VERDICT.md next-step 4)."""

    mesh: Mesh
    kmersize: int = 15
    local_kmersize: int = 9
    fill_len: int = 128
    fill_band: int = 32

    def __post_init__(self):
        from ..ops.affine_jax import _affine_batch
        from ..ops.chain_jax import chain_scores_batch

        mesh = self.mesh
        bs = NamedSharding(mesh, P("dp"))
        rep = NamedSharding(mesh, P())

        def step(anchors, n_valid, skip_i, maxdiff_i,
                 l_anchors, l_valid, l_skip, l_maxdiff,
                 targets, queries, t_len, q_len):
            S_g, P_g = chain_scores_batch(
                anchors, n_valid, skip_i, maxdiff_i,
                kmersize=self.kmersize, maxdiff=50, maxgap=1000,
                skipcost=40.0, variant="global",
            )
            S_l, P_l = chain_scores_batch(
                l_anchors, l_valid, l_skip, l_maxdiff,
                kmersize=self.local_kmersize, maxdiff=30, maxgap=99,
                skipcost=30.0, variant="fine",
            )
            tb, best, best_i, best_j, dead, dlo = _affine_batch(
                targets, queries, t_len, q_len, W=self.fill_band,
                zdrop=-1, glob=True,
            )
            n_mapped = jnp.sum((jnp.max(S_g, axis=1) > 60.0).astype(jnp.int32))
            return S_g, P_g, S_l, P_l, best, n_mapped

        self._fn = jax.jit(
            step,
            in_shardings=(bs,) * 12,
            out_shardings=(bs, bs, bs, bs, bs, rep),
        )

    def __call__(self, *args):
        return self._fn(*args)


def initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (jax.distributed); no-op single host.

    After initialize, a cross-process device barrier proves the cluster
    is actually functional (collectives route) rather than merely
    RPC-connected — the reference has no multi-host analog to compare
    against (its parallelism is one host's process pool, vacmap:390)."""
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("vacmap_tpu_boot")
