"""Native (C++) control-plane components, loaded via ctypes.

The reference's runtime — block manager, scheduler bookkeeping — is native
Rust; here the block manager's hot path (xxh64 chained prefix hashing,
refcounted allocation, FIFO recycling) is C++ (cpp/block_manager.cc) with a
C ABI. The library is built on demand with `make` and cached; when the
toolchain or build is unavailable everything falls back to the pure-Python
implementation (engine/block_manager.py), which stays the behavioral
oracle for tests.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional

logger = logging.getLogger(__name__)

_CPP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libnanovllm_native.so")

_lib = None
_lib_lock = threading.Lock()
_load_failed = False


def _build_if_needed() -> bool:
    src = os.path.join(_CPP_DIR, "block_manager.cc")
    if not os.path.isfile(src):
        return os.path.isfile(_LIB_PATH)
    if os.path.isfile(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src):
        return True
    try:
        subprocess.run(
            ["make", "-s", "-C", _CPP_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception as e:  # no toolchain / build failure → Python fallback
        logger.warning("native build failed (%s); using pure-Python control plane", e)
        return False


def load_native() -> Optional[ctypes.CDLL]:
    """The loaded library, building it first if necessary; None if
    unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lib_lock:
        if _lib is not None or _load_failed:
            return _lib
        if not _build_if_needed():
            _load_failed = True
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:
            logger.warning("native load failed (%s)", e)
            _load_failed = True
            return None
        lib.nvbm_create.restype = ctypes.c_void_p
        lib.nvbm_create.argtypes = [ctypes.c_int64, ctypes.c_int64, ctypes.c_int]
        lib.nvbm_destroy.argtypes = [ctypes.c_void_p]
        lib.nvbm_num_free.restype = ctypes.c_int64
        lib.nvbm_num_free.argtypes = [ctypes.c_void_p]
        I64P = ctypes.POINTER(ctypes.c_int64)
        U8P = ctypes.POINTER(ctypes.c_uint8)
        lib.nvbm_allocate.restype = ctypes.c_int64
        lib.nvbm_allocate.argtypes = [
            ctypes.c_void_p, I64P, ctypes.c_int64, I64P, I64P, U8P
        ]
        lib.nvbm_deallocate.argtypes = [ctypes.c_void_p, I64P, ctypes.c_int64]
        lib.nvbm_release_below.restype = ctypes.c_int64
        lib.nvbm_release_below.argtypes = [ctypes.c_void_p, I64P, ctypes.c_int64]
        lib.nvbm_wipe_identity.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.nvbm_undo_allocate.argtypes = [ctypes.c_void_p, I64P, ctypes.c_int64, U8P]
        lib.nvbm_reserve.restype = ctypes.c_int64
        lib.nvbm_reserve.argtypes = [ctypes.c_void_p, I64P, ctypes.c_int64]
        lib.nvbm_register_progress.argtypes = [
            ctypes.c_void_p, I64P, ctypes.c_int64, I64P, ctypes.c_int64
        ]
        lib.nvbm_stats.argtypes = [ctypes.c_void_p, I64P]
        lib.nvbm_xxh64.restype = ctypes.c_uint64
        lib.nvbm_xxh64.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return load_native() is not None


def _arr(values: List[int]) -> "ctypes.Array":
    return (ctypes.c_int64 * len(values))(*values)


class NativeBlockManager:
    """ctypes wrapper with the same interface as engine.block_manager
    .BlockManager (duck-typed; the scheduler and engine only use this
    surface)."""

    def __init__(self, num_blocks: int, block_size: int, enable_prefix_caching: bool = True):
        if num_blocks <= 0:
            raise ValueError("num_blocks must be positive")
        lib = load_native()
        if lib is None:
            raise RuntimeError("native block manager unavailable")
        self._lib = lib
        self._h = lib.nvbm_create(num_blocks, block_size, int(enable_prefix_caching))
        self.num_blocks = num_blocks
        self.block_size = block_size
        self.enable_prefix_caching = enable_prefix_caching

    def __del__(self):
        h, self._h = getattr(self, "_h", None), None
        if h:
            self._lib.nvbm_destroy(h)

    # -- interface parity with the Python BlockManager -------------------
    def num_free_blocks(self) -> int:
        return self._lib.nvbm_num_free(self._h)

    def can_allocate(self, seq) -> bool:
        return self.num_free_blocks() >= seq.num_blocks()

    def allocate(self, seq) -> None:
        if seq.block_table:
            raise RuntimeError(f"sequence {seq.seq_id} already has allocated blocks")
        n = len(seq.token_ids)
        nb = (n + self.block_size - 1) // self.block_size
        out_table = (ctypes.c_int64 * nb)()
        out_cached = ctypes.c_int64(0)
        out_hits = (ctypes.c_uint8 * nb)()
        rc = self._lib.nvbm_allocate(
            self._h, _arr(seq.token_ids), n, out_table,
            ctypes.byref(out_cached), out_hits,
        )
        if rc != 0:
            raise RuntimeError("out of KV-cache blocks during allocate")
        seq.block_table = list(out_table)
        seq.num_cached_tokens = int(out_cached.value)
        seq.prefix_hit_block_ids = {
            bid for bid, hit in zip(seq.block_table, out_hits) if hit
        }

    def deallocate(self, seq) -> None:
        if seq.block_table:
            self._lib.nvbm_deallocate(self._h, _arr(seq.block_table), len(seq.block_table))
        seq.block_table = []
        seq.num_cached_tokens = 0

    def release_below_window(self, seq, keep_from_pos: int) -> int:
        """Sliding-window rolling buffer (see
        engine.block_manager.BlockManager.release_below_window)."""
        last = min(len(seq.block_table), keep_from_pos // self.block_size)
        if last <= 0:
            return 0
        freed = self._lib.nvbm_release_below(
            self._h, _arr(seq.block_table), last
        )
        hit_ids = getattr(seq, "prefix_hit_block_ids", set())
        for idx in range(last):
            if seq.block_table[idx] >= 0:
                hit_ids.discard(seq.block_table[idx])
                seq.block_table[idx] = -1
        return int(freed)

    def undo_allocate(self, seq) -> None:
        """Deallocate a never-prefilled sequence, wiping the hash identity
        of blocks whose KV was never computed; prefix-cache HIT blocks keep
        theirs (see engine.block_manager.BlockManager.undo_allocate)."""
        if seq.block_table:
            hit_ids = getattr(seq, "prefix_hit_block_ids", set())
            hits = (ctypes.c_uint8 * len(seq.block_table))(
                *(1 if bid in hit_ids else 0 for bid in seq.block_table)
            )
            self._lib.nvbm_undo_allocate(
                self._h, _arr(seq.block_table), len(seq.block_table), hits
            )
        seq.block_table = []
        seq.num_cached_tokens = 0
        seq.prefix_hit_block_ids = set()

    def blocks_needed(self, seq, window: int = 1) -> int:
        highest_pos = seq.total_len() + window - 2
        total = highest_pos // self.block_size + 1
        return max(0, total - len(seq.block_table))

    def can_append(self, seq, window: int = 1) -> bool:
        return self.num_free_blocks() >= self.blocks_needed(seq, window)

    def may_append(self, seq, window: int = 1) -> None:
        need = self.blocks_needed(seq, window)
        if need:
            out_new = (ctypes.c_int64 * need)()
            rc = self._lib.nvbm_reserve(self._h, out_new, need)
            if rc < 0:
                raise RuntimeError("out of KV-cache blocks during append")
            seq.block_table.extend(out_new)
        self.register_decode_progress(seq)

    def register_decode_progress(self, seq, n_tokens=None) -> None:
        if not seq.block_table:
            return
        # n_tokens bounds the committed-token horizon (chunked prefill
        # passes processed+1); the C++ kernel takes it explicitly.
        n = len(seq.token_ids) if n_tokens is None else min(
            n_tokens, len(seq.token_ids)
        )
        self._lib.nvbm_register_progress(
            self._h, _arr(seq.token_ids[:n]), n,
            _arr(seq.block_table), len(seq.block_table),
        )

    def defer_identities_beyond(self, seq, pos: int) -> None:
        """Chunked prefill (see
        engine.block_manager.BlockManager.defer_identities_beyond)."""
        hit_ids = getattr(seq, "prefix_hit_block_ids", set())
        for idx in range(pos // self.block_size, len(seq.block_table)):
            bid = seq.block_table[idx]
            if bid >= 0 and bid not in hit_ids:
                self._lib.nvbm_wipe_identity(self._h, bid)

    def get_stats(self):
        from nanovllm_tpu.engine.block_manager import BlockManagerStats

        out = (ctypes.c_int64 * 6)()
        self._lib.nvbm_stats(self._h, out)
        return BlockManagerStats(
            total_blocks=out[0], free_blocks=out[1], used_blocks=out[2],
            cached_blocks=out[3], cache_hits=out[4], cache_queries=out[5],
        )


def create_block_manager(num_blocks: int, block_size: int,
                         enable_prefix_caching: bool = True,
                         backend: str = "auto"):
    """Factory: native C++ when available (backend="auto"/"native"),
    otherwise the pure-Python implementation."""
    from nanovllm_tpu.engine.block_manager import BlockManager

    if backend == "python":
        return BlockManager(num_blocks, block_size, enable_prefix_caching)
    if backend in ("auto", "native"):
        if native_available():
            return NativeBlockManager(num_blocks, block_size, enable_prefix_caching)
        if backend == "native":
            raise RuntimeError("native block manager requested but unavailable")
        return BlockManager(num_blocks, block_size, enable_prefix_caching)
    raise ValueError(f"unknown block manager backend {backend!r}")
