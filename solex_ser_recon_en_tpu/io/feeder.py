"""Host->HBM frame feeder.

The reference normalises every frame on the host (rot90 + 8->16-bit upscale,
video_reader.py:117-122).  On this host (one CPU core) that copy would cost
more than the entire device pipeline, so the feeder ships the *raw* on-disk
frame layout (a zero-copy memmap slice) to HBM and performs the rotation and
upscale as device ops fused into the consumer.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ser import SerReader
from .video import VideoReader, _SerVideo


@partial(jax.jit, static_argnames=("rotate", "upscale"))
def normalize_frames(raw: jax.Array, rotate: bool, upscale: bool) -> jax.Array:
    """(F, H, W) raw frames -> (F, ih, iw) uint16, on device.

    rotate: np.rot90 over the spatial axes (wavelength axis -> X).
    upscale: 8-bit -> 16-bit x256.
    """
    out = raw
    if upscale:
        out = out.astype(jnp.uint16) << 8
    if rotate:
        # np.rot90(img): out[i, j] = img[j, W-1-i]
        out = jnp.flip(jnp.swapaxes(out, 1, 2), axis=1)
    return out


# the axon relay's throughput collapses on large single transfers
# (measured: 64MB ~0.4 GB/s, 500MB ~0.06 GB/s) — cap per-put size
_TARGET_CHUNK_BYTES = 96 * 1024 * 1024


def probe_transfer_rate(sample_bytes: int = 24 * 1024 * 1024) -> float:
    """Measured host->device bandwidth (bytes/s) for the feed policy.

    Token-bucket links read artificially fast on one burst, so the probe
    sends a small warm-up put first and then takes the WORST of two timed
    samples — still an upper bound on the sustained rate (draining the
    bucket outright would cost more than it saves), which is why the feed
    policy treats the reading as optimistic.
    """
    import time

    global _PROBE_CACHE
    now = time.monotonic()
    if _PROBE_CACHE is not None and now - _PROBE_CACHE[1] < _PROBE_TTL_S:
        return _PROBE_CACHE[0]
    jax.device_put(np.ones(4 * 1024 * 1024, np.uint8)).block_until_ready()
    rate = float("inf")
    for _ in range(2):
        buf = np.ones(sample_bytes // 2, dtype=np.uint16)
        t0 = time.perf_counter()
        jax.device_put(buf).block_until_ready()
        dt = max(time.perf_counter() - t0, 1e-6)
        rate = min(rate, sample_bytes / dt)
    _PROBE_CACHE = (rate, now)
    return rate


# probing costs ~50 MB of link budget — memoise within a process (folder
# batches would otherwise re-pay it per file)
_PROBE_CACHE = None
_PROBE_TTL_S = 600.0
_SMALL_BYTES_SEEN = 0


def cached_probe_rate():
    """The memoised probe reading (bytes/s), or None when none is fresh —
    lets small-scan feed decisions consult a prior probe for free."""
    import time

    if _PROBE_CACHE is not None and time.monotonic() - _PROBE_CACHE[1] < _PROBE_TTL_S:
        return _PROBE_CACHE[0]
    return None


_D2H_CACHE = None  # (best_bps: float, monotonic time)
_D2H_TTL_S = 120.0
_D2H_REFRESHING = None  # in-flight background refresh thread flag (lock'd)
_D2H_LOCK = None  # created lazily (threading import stays function-local)


def _d2h_measure(timeout_s: float) -> float:
    """One bounded D2H rate sample (best-of-2 1 MB readbacks after a tiny
    liveness readback); 0.0 when the link stalls past ``timeout_s``.  The
    sample runs in a daemon thread and is abandoned on timeout — a stalled
    readback cannot be cancelled."""
    import threading
    import time

    done = threading.Event()
    best_bps = [0.0]

    def sample():
        try:
            np.asarray(jax.device_put(np.zeros(1024, np.uint8)))
            buf = np.zeros(1 << 20, np.uint8)
            for _ in range(2):
                dev = jax.device_put(buf)
                dev.block_until_ready()  # upload is not the measurement
                t0 = time.perf_counter()
                np.asarray(dev)
                dt = max(time.perf_counter() - t0, 1e-9)
                best_bps[0] = max(best_bps[0], buf.nbytes / dt)
            done.set()
        except Exception:
            pass

    threading.Thread(target=sample, daemon=True).start()
    return best_bps[0] if done.wait(timeout_s) else 0.0


def d2h_responsive(timeout_s: float = 5.0, min_bps: float = None) -> bool:
    """Whether device->host readback is alive AND fast enough to carry
    the pipeline's downloads.

    The H2D probe cannot see a throttled *download* direction — observed
    on the relay: uploads at 311 MB/s while a 0.25 MB readback hung for
    minutes (each direction has its own weather).  Every device-path
    stage ends in a readback (pass-A accumulators, fit inputs, product
    images — tens of MB per scan), so a dead OR trickling D2H direction
    makes the device pipeline strictly worse than the host fast paths.
    Mere responsiveness is not enough: a 1 KB canary answers in ~25 ms on
    a link delivering 0.04 MB/s, and a batch routed by that verdict then
    spends 10+ s per readback (observed: a 0.9 s 50-file batch took 35 s).

    So the canary measures RATE: a tiny liveness readback first (a dead
    direction hangs there without spending the timeout on the big
    sample), then best-of-2 1 MB readbacks, requiring ``min_bps``
    (default 50 MB/s, override SOLEX_D2H_FLOOR_MBPS; best-of-2 so one
    first-touch latency hiccup cannot fail a healthy link).  A stalled
    readback cannot be cancelled, so the samples run in a daemon thread
    and are abandoned on timeout.  Memoised briefly (the weather shifts
    by the minute): a folder batch pays the probe once, not per file.
    Normally-attached hosts move GB/s and pass in milliseconds.

    Only the FIRST verdict of the process blocks.  Once a measurement
    exists, a TTL expiry serves the stale verdict immediately and kicks
    ONE background re-probe whose result feeds the next query — so a
    long dead-link batch never pays ``timeout_s`` inside a timed stage
    per TTL (observed: a 0.28 s scan recorded as 5.4 s because it drew
    the re-probe), while a healing link is still re-adopted within a
    TTL plus one probe duration.
    """
    import os
    import threading
    import time

    global _D2H_CACHE, _D2H_LOCK, _D2H_REFRESHING
    if min_bps is None:
        try:
            floor_mbps = float(os.environ.get("SOLEX_D2H_FLOOR_MBPS", "50"))
        except ValueError:
            floor_mbps = 50.0  # malformed override must not fail the run
        min_bps = floor_mbps * 1e6
    if _D2H_LOCK is None:
        _D2H_LOCK = threading.Lock()
    now = time.monotonic()
    # Cache the measured rate, not the verdict: a later call with a
    # different min_bps re-judges the same sample instead of inheriting a
    # verdict computed under another threshold.
    if _D2H_CACHE is not None:
        if now - _D2H_CACHE[1] < _D2H_TTL_S:
            return _D2H_CACHE[0] >= min_bps
        with _D2H_LOCK:
            if _D2H_REFRESHING is None or not _D2H_REFRESHING.is_alive():
                def refresh():
                    global _D2H_CACHE
                    measured = _d2h_measure(timeout_s)
                    _D2H_CACHE = (measured, time.monotonic())

                _D2H_REFRESHING = threading.Thread(target=refresh,
                                                   daemon=True)
                _D2H_REFRESHING.start()
        return _D2H_CACHE[0] >= min_bps
    measured = _d2h_measure(timeout_s)
    _D2H_CACHE = (measured, time.monotonic())
    return measured >= min_bps


class FeedCollapse(RuntimeError):
    """A monitored device feed's sustained rate collapsed mid-scan.

    Token-bucket links pass the up-front probe on burst credit and then
    collapse to a trickle once the bucket drains (docs/PERF.md); callers
    catch this and restart the pass on the host path (pipeline/run.py)
    instead of riding a dead link for the rest of a multi-GB scan.
    ``rate`` is the measured sustained rate (bytes/s) — callers feed it to
    ``note_collapse`` so later feed decisions in this process see the real
    link rate instead of the burst-flattered probe.
    """

    def __init__(self, msg: str, rate: float = None):
        super().__init__(msg)
        self.rate = rate


class FeedRateMonitor:
    """Sustained-rate watchdog for a chunked host->device feed.

    ``note(nbytes)`` after each dispatched chunk; once at least
    ``min_sample_bytes`` have been pushed, the average loop rate (device
    put backpressure makes the loop converge to the link rate) is checked
    against ``min_rate`` — a collapse with substantial work remaining
    raises FeedCollapse.  The remaining-work guard stops a near-complete
    pass from being restarted for marginal benefit.

    Two tiers: the main floor (default 150 MB/s, hysteresis under the
    200 MB/s the feed policy demanded to choose the device path) applies
    after the full sample window; a quarter of the floor applies after a
    quarter of the window, so an abysmal link is abandoned in ~5 s instead
    of being ridden for the whole window (at 10 MB/s the 192 MB window
    alone costs ~19 s).  Sustaining under the main floor means the up-front
    probe was flattered by burst credit and the host pass (GB/s page-cache
    sweeps) wins with certainty; normally-attached TPU hosts (>= 1 GB/s
    DMA) never come near either floor.  Observed in the wild: a probe
    window read >= 200 MB/s, the bucket drained, and five bench runs each
    dragged 2.4 GB at ~43 MB/s — 56 s of pass A that the host path does in
    0.5 s.
    """

    def __init__(
        self,
        total_bytes: int,
        min_rate: float = None,
        min_sample_bytes: int = None,
        min_remaining_bytes: int = None,
        clock=None,
    ):
        import os
        import time

        self._total = int(total_bytes)
        env = os.environ.get("SOLEX_FEED_MIN_RATE")
        self._min_rate = float(env) if env else (
            min_rate if min_rate is not None else 150e6
        )
        # DEFAULT sample window and remaining-work guard scale with the
        # scan (explicit caller values are honoured as-is): small scans
        # skip the up-front probe (cheaper to just feed), so the watchdog
        # is their ONLY trickle defence — under fixed 192/384 MB
        # thresholds a 52 MB scan rode a 0.2 MB/s link for the full 266 s
        # (observed) when the host path does it in ~4 s.  The floors
        # (4/8 MB) keep single-burst noise from triggering on tiny scans;
        # big scans keep the proven fixed windows.
        if min_sample_bytes is None:
            min_sample_bytes = min(
                192 * 1024**2, max(self._total // 4, 4 * 1024**2)
            )
        if min_remaining_bytes is None:
            min_remaining_bytes = min(
                384 * 1024**2, max(self._total // 4, 8 * 1024**2)
            )
        self._min_sample = int(min_sample_bytes)
        self._min_remaining = int(min_remaining_bytes)
        self._clock = clock or time.monotonic
        self._bytes = 0
        self._t0 = None
        self._prev = None

    def note_chunk(self, chunk) -> None:
        """note() for a device array, measuring REAL transfer progress.

        ``jax.device_put`` is asynchronous: a feed loop can enqueue the
        whole scan in host time while the transfers crawl behind — a naive
        per-iteration clock then reads host memmap speed and the watchdog
        never fires (observed: a 19.5 MB/s link rode unmonitored for 123 s
        because the sync point was after the loop).  Blocking on the
        PREVIOUS chunk keeps a one-deep transfer pipeline (chunk k+1
        uploads while k is awaited — no overlap lost, and staging memory
        stays bounded at two chunks) and makes the loop rate the link rate.
        """
        prev, self._prev = self._prev, chunk
        if prev is not None:
            try:
                prev.block_until_ready()
            except AttributeError:
                pass
            self.note(int(prev.nbytes))

    def note(self, nbytes: int) -> None:
        if self._t0 is None:
            self._t0 = self._clock()  # start at first chunk: excludes setup
            return  # first chunk's bytes land before the clock starts
        self._bytes += int(nbytes)
        # fast tier: an abysmal link (well under the host path's certainty
        # zone) should not be ridden for the full sample window — at
        # 10 MB/s the 192 MB window alone costs ~19 s
        if self._bytes >= self._min_sample:
            self._check(self._min_rate)
        elif self._bytes >= self._min_sample // 4:
            self._check(self._min_rate / 4)

    def _check(self, floor: float) -> None:
        dt = max(self._clock() - self._t0, 1e-9)
        rate = self._bytes / dt
        remaining = self._total - self._bytes
        if rate < floor and remaining > self._min_remaining:
            raise FeedCollapse(
                f"sustained {rate / 1e6:.1f} MB/s after "
                f"{self._bytes // 2**20} MB with {remaining // 2**20} MB "
                f"to go (floor {floor / 1e6:.0f} MB/s)",
                rate=rate,
            )


def note_collapse(rate: float) -> None:
    """Record a measured mid-scan collapse as the probe reading.

    The sustained rate a FeedRateMonitor measured over >= 192 MB is far
    better evidence than the probe's 24 MB burst sample — cache it so every
    subsequent feed decision in this process (bench re-runs, folder
    batches) goes straight to the host path instead of re-living the
    collapse once per file.
    """
    import time

    global _PROBE_CACHE
    if rate is not None:
        _PROBE_CACHE = (float(rate), time.monotonic())


def pad_to_bucket(arr: np.ndarray, chunk: int) -> np.ndarray:
    """Zero-pad a trailing chunk to the bucket shape so every scan with the
    same frame geometry reuses ONE compiled program regardless of length
    (zeros are neutral for sum/max; recon output is sliced to the true
    frame count)."""
    n = arr.shape[0]
    if n >= chunk:
        return arr
    return np.concatenate([arr, np.zeros((chunk - n,) + arr.shape[1:], arr.dtype)])


def note_small_scan(nbytes: int) -> int:
    """Track cumulative small-scan feed volume; once a folder batch has
    pushed more than a probe costs, a real probe becomes worth paying."""
    global _SMALL_BYTES_SEEN
    _SMALL_BYTES_SEEN += int(nbytes)
    return _SMALL_BYTES_SEEN


def prefetch_iter(it, depth: int = 2):
    """Run ``it`` in a background thread, keeping ``depth`` items ready.

    Used to double-buffer host-side chunk preparation (band extraction,
    memmap reads) against device compute: the producer stages chunk k+1
    while the consumer's matmuls chew on chunk k.

    If the consumer abandons the generator (exception downstream, early
    close), the producer is told to stop instead of blocking forever on the
    full queue holding staged host/HBM buffers.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    done = object()
    stop = threading.Event()

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def run():
        try:
            for item in it:
                if not put(item):
                    return
            put(done)
        except BaseException as e:  # surfaced on the consumer side
            put(e)

    threading.Thread(target=run, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        try:  # unblock a producer mid-put and drop staged buffers
            while True:
                q.get_nowait()
        except queue.Empty:
            pass


def auto_chunk_frames(frame_bytes: int, requested: int) -> int:
    """Frames per host->device transfer, capped to ~96MB per put."""
    cap = max(1, _TARGET_CHUNK_BYTES // max(frame_bytes, 1))
    return max(1, min(requested, cap))


def shard_count0(sharding) -> int:
    """Number of ways ``sharding`` splits axis 0 (1 when None/replicated)."""
    if sharding is None:
        return 1
    try:
        ax = sharding.spec[0]
    except (AttributeError, IndexError):
        return 1
    if ax is None:
        return 1
    axes = ax if isinstance(ax, tuple) else (ax,)
    n = 1
    for a in axes:
        n *= int(sharding.mesh.shape[a])
    return n


def _fit_chunk_to_shards(chunk: int, sharding) -> int:
    """Chunk frame counts must divide evenly over the frame-axis shards."""
    n = shard_count0(sharding)
    return max(n, (chunk // n) * n)


def raw_device_chunks(
    vid: VideoReader, chunk: int, sharding=None
) -> Tuple[Iterator[Tuple[int, jax.Array]], bool, bool]:
    """(iterator of raw device chunks, rotate, upscale) for SER scans.

    The chunks are in on-disk layout — consumers (ops/fused.py) contract
    them without a normalisation pass.  Raises TypeError for non-SER
    sources (no raw layout to exploit).  ``sharding`` (a NamedSharding over
    the frame axis) splits every chunk across the mesh as it is put.
    """
    if not isinstance(vid, _SerVideo):
        raise TypeError("raw chunks only for SER sources")
    r: SerReader = vid._r
    chunk = _fit_chunk_to_shards(auto_chunk_frames(r.header.frame_bytes, chunk), sharding)

    def gen():
        # the memmap slice is the zero-copy transfer source (device_put
        # reads the pages directly); the native library contributes the
        # madvise readahead for the NEXT slab so disk I/O overlaps the
        # transfer.  A native ser_read memcpy here would double host
        # memory traffic — the scarce resource on this class of host.
        native = None
        try:
            from .native import NativeSerReader

            native = NativeSerReader(r.path)
        except Exception:
            native = None
        try:
            for start in range(0, r.frame_count, chunk):
                n = min(chunk, r.frame_count - start)
                if native is not None:
                    native.prefetch(start + n, chunk)
                raw = pad_to_bucket(np.asarray(r.raw_frames(start, n)), chunk)
                yield start, jax.device_put(raw, sharding)
        finally:
            if native is not None:
                native.close()

    return gen(), r.flag_rotate, r.header.pixel_depth == 8


def device_chunks(
    vid: VideoReader, chunk: int, sharding=None
) -> Iterator[Tuple[int, jax.Array]]:
    """Yield (start, normalised device chunk) overlapping upload with use.

    For SER files the raw memmap slice is shipped as-is (no host copy) and
    normalised on device; other containers fall back to host-normalised
    reads.  Device puts are async, so the next chunk uploads while the
    previous one computes.
    """
    if isinstance(vid, _SerVideo):
        r: SerReader = vid._r
        upscale = r.header.pixel_depth == 8
        rotate = r.flag_rotate
        chunk = _fit_chunk_to_shards(
            auto_chunk_frames(r.header.frame_bytes, chunk), sharding
        )
        nsh = shard_count0(sharding)

        native = None
        try:
            from .native import NativeSerReader

            native = NativeSerReader(r.path)
        except Exception:
            native = None

        def slab(start: int, n: int) -> np.ndarray:
            # zero-copy memmap source; native layer provides readahead only
            if native is not None:
                native.prefetch(start + n, chunk)
            return np.asarray(r.raw_frames(start, n))

        pending = []
        try:
            for start in range(0, r.frame_count, chunk):
                n = min(chunk, r.frame_count - start)
                # a trailing remainder that doesn't divide over the mesh
                # goes up unsharded (consumers here track true frame counts,
                # so zero-padding is not an option on this path)
                sh = sharding if n % nsh == 0 else None
                dev = jax.device_put(slab(start, n), sh)
                pending.append((start, dev))
                if len(pending) > 1:
                    s0, d0 = pending.pop(0)
                    yield s0, normalize_frames(d0, rotate, upscale)
            for s0, d0 in pending:
                yield s0, normalize_frames(d0, rotate, upscale)
        finally:
            if native is not None:
                native.close()
    else:
        for start, c in vid.chunks(chunk):
            yield start, jax.device_put(c)
