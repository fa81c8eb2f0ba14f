"""Replicated-index data parallelism.

The reference's only parallelism is N worker threads pulling read batches
from a mutex-guarded queue against one shared in-memory index
(main.cpp:219-223). The TPU-native equivalent: the index lives replicated in
every chip's HBM (zero collectives on the probe path) and each batch is
sharded over the mesh's data axis; XLA partitions the whole classify kernel
with no communication, so scaling is linear in chips.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from shark_tpu.classify.step import (
    DeviceIndex,
    StaticMeta,
    build_device_index,
    classify_kernel,
    classify_kernel_packed,
    emit_threshold_table,
)
from shark_tpu.index.structure import SharkIndex
from shark_tpu.parallel.mesh import make_mesh


class DataParallelClassifier:
    def __init__(
        self,
        index: SharkIndex,
        max_winners: int = 16,
        c: float = 0.6,
        n_devices: int = 0,
        mesh=None,
        probe=None,
    ):
        self.index = index
        self.max_winners = max_winners
        self.c = c
        self.mesh = mesh or make_mesh(n_devices)
        self.n_devices = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names]))
        repl = NamedSharding(self.mesh, P())
        self._repl = repl
        built = None
        if probe in (None, "hashed"):
            from shark_tpu.classify.hashed import (
                HashedDeviceIndex,
                build_hashed_index,
            )

            built = build_hashed_index(index)
            if built is None and probe == "hashed":
                raise ValueError("hashed probe table not buildable")
        if built is not None:
            from shark_tpu.classify.step import build_rows3

            table, stash, self._hmeta = built
            rows3, ext_mat = (
                build_rows3(index)
                if self._hmeta.has_rows
                else (np.zeros((1, 2), np.uint16), None)
            )
            self.dix = HashedDeviceIndex(
                table=jax.device_put(table, repl),
                stash=jax.device_put(stash, repl),
                rows3=jax.device_put(rows3, repl),
                ext_mat=(
                    jax.device_put(ext_mat, repl)
                    if ext_mat is not None
                    else None
                ),
            )
            self.probe = "hashed"
            self._has_rows = self._hmeta.has_rows
        else:
            bf_rank, pay, rows3, ext_mat = build_device_index(index)
            self._has_rows = bool((np.diff(index.offsets) >= 3).any())
            self.dix = DeviceIndex(
                bf_rank=jax.device_put(bf_rank, repl),
                pay=jax.device_put(pay, repl),
                rows3=jax.device_put(rows3, repl),
                ext_mat=(
                    jax.device_put(ext_mat, repl)
                    if ext_mat is not None
                    else None
                ),
            )
            self.probe = "classic"
        self._fns = {}
        self._thresh = {}

    def _fn(self, L: int, packed: bool = False):
        key = (L, packed)
        fn = self._fns.get(key)
        if fn is None:
            meta = StaticMeta.for_index(self.index, L)
            batch_sharded = NamedSharding(self.mesh, P("dp"))
            if self.probe == "hashed":
                from shark_tpu.classify.hashed import (
                    classify_kernel_hashed,
                    classify_kernel_hashed_packed,
                )

                kern = functools.partial(
                    classify_kernel_hashed_packed
                    if packed
                    else classify_kernel_hashed,
                    meta=meta,
                    hmeta=self._hmeta,
                    max_winners=self.max_winners,
                )
            else:
                kern = functools.partial(
                    classify_kernel_packed if packed else classify_kernel,
                    meta=meta,
                    max_winners=self.max_winners,
                    has_rows=self._has_rows,
                )
            data_shardings = (
                (batch_sharded, batch_sharded) if packed else (batch_sharded,)
            )
            dix_spec = jax.tree.map(lambda _: self._repl, self.dix)
            fn = jax.jit(
                kern,
                in_shardings=(dix_spec, self._repl) + data_shardings,
                out_shardings=(
                    batch_sharded,
                    batch_sharded,
                    batch_sharded,
                    batch_sharded,
                ),
            )
            self._fns[key] = fn
            if L not in self._thresh:
                self._thresh[L] = jax.device_put(
                    emit_threshold_table(self.c, L), self._repl
                )
        return fn

    def _check_b(self, B: int):
        if B % self.n_devices != 0:
            raise ValueError(
                f"batch size {B} not divisible by {self.n_devices} devices"
            )

    def __call__(self, codes: np.ndarray):
        self._check_b(codes.shape[0])
        fn = self._fn(codes.shape[1])
        return fn(self.dix, self._thresh[codes.shape[1]], codes)

    def call_packed(self, packed: np.ndarray, vmask: np.ndarray):
        self._check_b(packed.shape[0])
        L = packed.shape[1] * 4
        fn = self._fn(L, packed=True)
        return fn(self.dix, self._thresh[L], packed, vmask)
