"""Demand-loaded textures: the `lib/DemandLoading` twin, TPU-native.

The reference ships a 12.7k-LoC CUDA sparse-texture paging system (public
API `include/DemandLoading/DemandLoader.h`: createTexture / launchPrepare /
device `tex2D(ctx, id, u, v, &isResident)` / processRequests -> Ticket;
64-texel tiles, page table, host-side request handling on worker threads —
`PagingSystem.cpp`, `PageTableManager.h`, `Ticket.h`). It is compiled out of
the active build (`CMakeLists.txt:385-386`) but is the reference's answer to
scenes whose textures exceed device memory.

TPU re-design (no page faults, no sparse textures, no device callbacks —
everything is dense arrays + one feedback buffer):

- The device context (``DemandContext``) is a pytree passed into jitted
  code: a tile ATLAS ``(P, 64, 64, 3)`` of resident pages, a page table
  ``(total_pages,) int32`` mapping global tile id -> atlas slot (-1 =
  non-resident), per-tile mean colors (the always-resident fallback the
  reference gets from its coarse mip levels), and per-texture metadata.
- ``demand_tex2d`` point-samples N texels in one flat row gather from the
  atlas; non-resident samples return the tile-mean fallback and
  ``resident=False`` (the reference's ``isResident`` out-param).
- ``page_requests`` turns the per-sample page ids + resident mask into a
  total_pages bool bitmap with a single associative ``.at[].max`` scatter
  (race-free by construction — the scatter-free-writes discipline of
  render/film.py) — the twin of the device-side request buffer
  (`PagingSystemKernels.cu` pullRequests).
- ``DemandLoader.process_requests(bitmap)`` fills tiles on a worker thread
  pool and returns a ``Ticket`` (numTasksTotal / numTasksRemaining / wait,
  `Ticket.h` semantics); ``launch_prepare()`` re-uploads the (tiny) page
  table and any newly-filled atlas slots. LRU eviction when the atlas is
  full (`Memory/` allocators' role).

Sampling is nearest-texel (the paging machinery is the subsystem under
test; filtered lookups belong to models/texture.py's resident path).
"""

from __future__ import annotations

import dataclasses
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

TILE = 64  # texels per tile edge (TileIndexing.h block constants)


@dataclasses.dataclass(frozen=True)
class DemandContext:
    """Device-side state for jitted sampling (DeviceContext.h twin)."""

    atlas: jnp.ndarray  # (P, TILE, TILE, 3) f32 resident pages
    page_table: jnp.ndarray  # (total_pages,) int32 -> atlas slot | -1
    tile_mean: jnp.ndarray  # (total_pages, 3) f32 fallback color
    # (n_tex, 7) int32 [w, h, tiles_x, page_base, udim, vdim, sub_base]:
    # udim == 0 -> plain texture; else a UDIM grid texture whose (su, sv)
    # sub-image is texture id sub_base + sv*udim + su (createUdimTexture)
    tex_meta: jnp.ndarray

    @property
    def num_pages(self) -> int:
        return self.atlas.shape[0]


jax.tree_util.register_dataclass(
    DemandContext,
    data_fields=["atlas", "page_table", "tile_mean", "tex_meta"],
    meta_fields=[],
)


def _wrap01(x: jnp.ndarray) -> jnp.ndarray:
    """CU_TR_ADDRESS_MODE_WRAP (TileIndexing.h wrapTexCoord)."""
    return x - jnp.floor(x)


def demand_tex2d(
    ctx: DemandContext, tex_id: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Vectorized `tex2D(ctx, id, x, y, &isResident)` twin (Texture2D.h).

    Returns (rgb (N,3), resident (N,) bool, page_id (N,) int32). Non-resident
    samples get the tile-mean fallback. Feed ``page_id``/``resident`` to
    ``page_requests`` to build the frame's request bitmap.
    """
    meta = jnp.take(ctx.tex_meta, tex_id, axis=0)  # (N, 7)
    # UDIM indirection (tex2DGradUdim twin): pick the sub-image by the uv
    # integer cell, then sample it with the fractional coords
    udim, vdim, sub_base = meta[:, 4], meta[:, 5], meta[:, 6]
    is_udim = udim > 0
    uw = _wrap01(u) * jnp.maximum(udim, 1)
    vw = _wrap01(v) * jnp.maximum(vdim, 1)
    su = jnp.minimum(uw.astype(jnp.int32), jnp.maximum(udim - 1, 0))
    sv = jnp.minimum(vw.astype(jnp.int32), jnp.maximum(vdim - 1, 0))
    sub_id = jnp.where(is_udim, sub_base + sv * udim + su, tex_id)
    u = jnp.where(is_udim, uw - su, u)
    v = jnp.where(is_udim, vw - sv, v)
    meta = jnp.take(ctx.tex_meta, sub_id, axis=0)
    w, h, tiles_x, base = meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3]
    tx = jnp.minimum((_wrap01(u) * w).astype(jnp.int32), w - 1)
    ty = jnp.minimum((_wrap01(v) * h).astype(jnp.int32), h - 1)
    page = base + (ty // TILE) * tiles_x + (tx // TILE)
    slot = jnp.take(ctx.page_table, page, axis=0)
    resident = slot >= 0
    # one flat row gather for every resident texel (element-rate on TPU)
    flat = ctx.atlas.reshape(-1, 3)
    idx = (
        jnp.maximum(slot, 0) * (TILE * TILE)
        + (ty % TILE) * TILE
        + (tx % TILE)
    )
    texel = jnp.take(flat, idx, axis=0)
    fallback = jnp.take(ctx.tile_mean, page, axis=0)
    rgb = jnp.where(resident[:, None], texel, fallback)
    return rgb, resident, page


def page_requests(
    total_pages: int, page_id: jnp.ndarray, resident: jnp.ndarray
) -> jnp.ndarray:
    """Build the frame's request bitmap (total_pages,) bool: pages sampled
    while non-resident. Associative max-scatter — deterministic under any
    sample order (PagingSystemKernels.cu pullRequests twin)."""
    req = jnp.zeros((total_pages,), jnp.uint8)
    return req.at[page_id].max((~resident).astype(jnp.uint8)) > 0


class Ticket:
    """Host-side completion handle (Ticket.h semantics): -1 totals before
    processing starts; wait() joins the fill tasks."""

    def __init__(self):
        self._total = -1
        self._remaining = -1
        self._lock = threading.Lock()
        self._done = threading.Event()
        self.errors: list = []  # (page, exception) from failed fills

    def _start(self, total: int) -> None:
        with self._lock:
            self._total = total
            self._remaining = total
        if total == 0:
            self._done.set()

    def _task_done(self) -> None:
        with self._lock:
            self._remaining -= 1
            if self._remaining == 0:
                self._done.set()

    def num_tasks_total(self) -> int:
        with self._lock:
            return self._total

    def num_tasks_remaining(self) -> int:
        with self._lock:
            return self._remaining

    def wait(self, timeout: Optional[float] = None) -> bool:
        if self._total == 0:
            return True
        ok = self._done.wait(timeout)
        if self.errors:
            raise RuntimeError(f"tile fills failed: {self.errors[:3]}")
        return ok


class DemandLoader:
    """Host-side manager (DemandLoaderImpl twin): texture registry, page
    table, LRU atlas, request processing on a worker pool."""

    def __init__(self, max_pages: int = 256, num_threads: int = 4):
        self.max_pages = max_pages
        self._images: List[np.ndarray] = []
        # per-texture metadata rows [w, h, tiles_x, page_base, udim, vdim,
        # sub_base] (see DemandContext.tex_meta)
        self._meta: List[Tuple[int, ...]] = []
        self._total_pages = 0
        self._page_table: np.ndarray = np.zeros((0,), np.int32)
        self._tile_means: List[np.ndarray] = []
        self._atlas = np.zeros((max_pages, TILE, TILE, 3), np.float32)
        self._slot_page = np.full((max_pages,), -1, np.int64)  # slot -> page
        self._free: List[int] = list(range(max_pages))
        self._lru: Dict[int, int] = {}  # slot -> last-use stamp
        self._stamp = 0
        self._dirty_slots: set = set()
        self._table_dirty = True
        self._pool = ThreadPoolExecutor(max_workers=num_threads)
        self._dev: Optional[DemandContext] = None
        # statistics (Statistics.h twin)
        self.num_tiles_loaded = 0
        self.num_tiles_evicted = 0
        self.num_requests_processed = 0

    # ---- DemandLoader::createTexture ------------------------------------
    def create_texture(self, image: np.ndarray) -> int:
        """Register an image (H, W, 3 float32/uint8); returns the texture id
        to pass to demand_tex2d. No tile is resident initially."""
        img = np.asarray(image)
        if img.dtype == np.uint8:
            img = img.astype(np.float32) / 255.0
        img = img.astype(np.float32)
        h, w = img.shape[0], img.shape[1]
        tiles_x = -(-w // TILE)
        tiles_y = -(-h // TILE)
        base = self._total_pages
        self._images.append(img)
        self._meta.append((w, h, tiles_x, base, 0, 0, 0))
        n = tiles_x * tiles_y
        self._total_pages += n
        self._page_table = np.concatenate(
            [self._page_table, np.full((n,), -1, np.int32)]
        )
        # per-tile mean colors = the always-resident coarse fallback
        ph, pw = tiles_y * TILE, tiles_x * TILE
        padded = np.zeros((ph, pw, 3), np.float32)
        padded[:h, :w] = img
        cnt = np.zeros((ph, pw, 1), np.float32)
        cnt[:h, :w] = 1.0
        s = padded.reshape(tiles_y, TILE, tiles_x, TILE, 3).sum((1, 3))
        c = cnt.reshape(tiles_y, TILE, tiles_x, TILE, 1).sum((1, 3))
        self._tile_means.append(
            (s / np.maximum(c, 1.0)).reshape(n, 3).astype(np.float32)
        )
        self._table_dirty = True
        return len(self._images) - 1

    @property
    def total_pages(self) -> int:
        return self._total_pages

    # ---- DemandLoader::launchPrepare ------------------------------------
    def launch_prepare(self) -> DemandContext:
        """Upload (only) dirty state; returns the device context pytree."""
        if self._dev is None or self._table_dirty:
            self._dev = DemandContext(
                **jax.device_put(
                    dict(
                        atlas=self._atlas,
                        page_table=self._page_table,
                        tile_mean=np.concatenate(self._tile_means)
                        if self._tile_means
                        else np.zeros((0, 3), np.float32),
                        tex_meta=np.asarray(self._meta, np.int32).reshape(
                            -1, 7
                        ),
                    )
                )
            )
        elif self._dirty_slots:
            slots = np.asarray(sorted(self._dirty_slots), np.int32)
            self._dev = dataclasses.replace(
                self._dev,
                atlas=self._dev.atlas.at[jnp.asarray(slots)].set(
                    jnp.asarray(self._atlas[slots])
                ),
                page_table=jnp.asarray(self._page_table),
            )
        self._dirty_slots.clear()
        self._table_dirty = False
        return self._dev

    # ---- DemandLoader::processRequests ----------------------------------
    def process_requests(self, request_bitmap) -> Ticket:
        """Fill requested tiles on the worker pool; returns a Ticket. Call
        launch_prepare() after ticket.wait() to upload the new residents."""
        req = np.asarray(request_bitmap)
        pages = np.nonzero(req)[0]
        pages = [int(p) for p in pages if self._page_table[p] < 0]
        # bound one batch to the atlas capacity (Options::maxRequestedPages
        # twin) — excess pages simply re-request next frame
        pages = pages[: self.max_pages]
        ticket = Ticket()
        ticket._start(len(pages))
        self.num_requests_processed += len(pages)
        for page in pages:
            slot = self._alloc_slot()
            self._pool.submit(self._fill_tile, page, slot, ticket)
        return ticket

    def _alloc_slot(self) -> int:
        if self._free:
            return self._free.pop()
        # LRU eviction
        victim = min(self._lru, key=self._lru.get)
        del self._lru[victim]
        old_page = self._slot_page[victim]
        if old_page >= 0:
            self._page_table[old_page] = -1
            self.num_tiles_evicted += 1
        self._table_dirty = True
        return victim

    def _tex_of_page(self, page: int) -> int:
        """Owning texture = the page-owning entry (tiles_x > 0) with the
        largest page_base <= page (UDIM grid rows own no pages)."""
        best = -1
        for i, m in enumerate(self._meta):
            if m[2] > 0 and m[3] <= page and (
                best < 0 or m[3] > self._meta[best][3]
            ):
                best = i
        if best < 0:
            raise KeyError(page)
        return best

    # ---- DemandLoader::createUdimTexture --------------------------------
    def create_udim_texture(self, images, udim: int, vdim: int) -> int:
        """Register a UDIM grid of udim x vdim sub-images (row-major:
        images[sv * udim + su]); returns the grid texture id for
        demand_tex2d, which resolves (u, v) in [0,1) to the sub-image cell
        and samples it — the reference's createUdimTexture/tex2DGradUdim
        (DemandLoader.h). Sub-images page independently."""
        assert len(images) == udim * vdim and udim > 0 and vdim > 0
        sub_base = len(self._images) + 1  # ids AFTER the grid texture's own
        grid_id = len(self._images)
        # the grid row owns no pages (tiles_x = 0)
        self._images.append(np.zeros((1, 1, 3), np.float32))
        self._meta.append((1, 1, 0, self._total_pages, udim, vdim, sub_base))
        self._tile_means.append(np.zeros((0, 3), np.float32))
        for img in images:
            self.create_texture(img)
        self._table_dirty = True
        return grid_id

    def _fill_tile(self, page: int, slot: int, ticket: Ticket) -> None:
        try:
            tex = self._tex_of_page(page)
            w, h, tiles_x, base = self._meta[tex][:4]
            local = page - base
            ty, tx = divmod(local, tiles_x)
            img = self._images[tex]
            tile = np.zeros((TILE, TILE, 3), np.float32)
            y0, x0 = ty * TILE, tx * TILE
            sub = img[y0 : y0 + TILE, x0 : x0 + TILE]
            tile[: sub.shape[0], : sub.shape[1]] = sub
            self._atlas[slot] = tile
            self._page_table[page] = slot
            self._slot_page[slot] = page
            self._stamp += 1
            self._lru[slot] = self._stamp
            self._dirty_slots.add(slot)
            self.num_tiles_loaded += 1
        except Exception as e:  # fail LOUD at wait(): executor eats raises
            ticket.errors.append((page, e))
            self._free.append(slot)
        finally:
            ticket._task_done()

    def touch(self, pages) -> None:
        """Record page usage for LRU (the reference tracks usage via its
        page-table LRU bits)."""
        self._stamp += 1
        for p in np.asarray(pages).reshape(-1):
            s = self._page_table[int(p)]
            if s >= 0:
                self._lru[int(s)] = self._stamp
