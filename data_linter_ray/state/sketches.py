"""Mergeable sketches: t-digest (quantiles) and HyperLogLog (distinct).

Public-knowledge algorithms: Dunning & Ertl, "Computing extremely
accurate quantiles using t-digests" (arXiv:1902.04023) and Flajolet et
al., "HyperLogLog: the analysis of a near-optimal cardinality estimation
algorithm" (AofA 2007), with the standard linear-counting small-range
correction. Implemented from the papers on numpy — no external libs.

Both are commutative, associative merges — safe under Ray task retries
because the pipeline *emits partials as data* (one sketch row per batch)
rather than mutating actor state (SURVEY.md §7.4 "prefer emit-as-rows").
Serialization is a compact bytes payload so partial sketches travel as
ordinary Arrow binary columns through a groupby merge.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd


class TDigest:
    """Merging t-digest with the k1-style size bound
    (max centroid weight ≈ 4·n·q(1−q)/δ)."""

    def __init__(self, delta: int = 100):
        self.delta = delta
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self._buf_means: list[np.ndarray] = []
        self._buf_weights: list[np.ndarray] = []
        self._buffered = 0

    # -- building -------------------------------------------------------
    def add(self, values: np.ndarray, weights: np.ndarray | None = None) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self._buf_means.append(values)
        self._buf_weights.append(
            np.ones_like(values) if weights is None else np.asarray(weights, np.float64)
        )
        self._buffered += values.size
        if self._buffered > 32 * self.delta:
            self._compress()

    def _compress(self) -> None:
        if not self._buf_means and self.means.size <= 2 * self.delta:
            return
        means = np.concatenate([self.means] + self._buf_means)
        weights = np.concatenate([self.weights] + self._buf_weights)
        self._buf_means, self._buf_weights, self._buffered = [], [], 0
        order = np.argsort(means, kind="stable")
        means, weights = means[order], weights[order]
        total = weights.sum()
        out_means: list[float] = []
        out_weights: list[float] = []
        acc_mean, acc_w, seen = 0.0, 0.0, 0.0
        for m, w in zip(means, weights):
            q = (seen + acc_w + w / 2) / total
            limit = max(1.0, 4.0 * total * q * (1.0 - q) / self.delta)
            if acc_w + w <= limit or acc_w == 0.0:
                acc_mean += m * w
                acc_w += w
            else:
                out_means.append(acc_mean / acc_w)
                out_weights.append(acc_w)
                seen += acc_w
                acc_mean, acc_w = m * w, w
        if acc_w > 0:
            out_means.append(acc_mean / acc_w)
            out_weights.append(acc_w)
        self.means = np.asarray(out_means)
        self.weights = np.asarray(out_weights)

    def merge(self, other: "TDigest") -> "TDigest":
        other._compress()
        if other.means.size:
            self.add(other.means, other.weights)
        self._compress()
        return self

    # -- querying -------------------------------------------------------
    @property
    def count(self) -> float:
        return float(self.weights.sum()) + sum(w.sum() for w in self._buf_weights)

    def quantile(self, q: float) -> float:
        self._compress()
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights) - self.weights / 2
        target = q * self.weights.sum()
        return float(np.interp(target, cum, self.means))

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    # -- serialization --------------------------------------------------
    def to_bytes(self) -> bytes:
        self._compress()
        head = struct.pack("<Iq", self.delta, self.means.size)
        return head + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        delta, n = struct.unpack_from("<Iq", b, 0)
        td = cls(delta)
        off = struct.calcsize("<Iq")
        td.means = np.frombuffer(b, np.float64, n, off).copy()
        td.weights = np.frombuffer(b, np.float64, n, off + 8 * n).copy()
        return td


def _leading_pattern_rank(w: np.ndarray, bits: int) -> np.ndarray:
    """rho = position of the first 1-bit in the top `bits` bits of w, in
    1..bits+1 (vectorized; exact integer bit-length, no float log)."""
    bl = np.zeros(w.shape, dtype=np.int64)
    v = w.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        ge = v >= (np.uint64(1) << np.uint64(shift))
        bl[ge] += shift
        v[ge] >>= np.uint64(shift)
    bl[w > 0] += 1  # bit_length
    rho = bits - bl + 1
    rho[w == 0] = bits + 1
    return rho


class HyperLogLog:
    """Standard HLL with 2^p uint8 registers + linear counting."""

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=np.uint64)
        if h.size == 0:
            return
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - self.p)) - 1)
        rho = _leading_pattern_rank(w, 64 - self.p).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(2.0 ** -self.registers.astype(np.float64))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                est = m * np.log(m / zeros)
        return float(est)

    def to_bytes(self) -> bytes:
        return struct.pack("<I", self.p) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HyperLogLog":
        (p,) = struct.unpack_from("<I", b, 0)
        hll = cls(p)
        hll.registers = np.frombuffer(b, np.uint8, hll.m, 4).copy()
        return hll


def hash_array(values, seed: int = 42) -> np.ndarray:
    """Stable vectorized 64-bit hash of an arrow/numpy/pandas array.

    polars' seeded hash is cross-process deterministic (for a fixed
    polars version — pin it alongside this engine) and ~40× faster than
    pandas' hash_pandas_object on string columns; pandas is the fallback
    when polars is unavailable.

    Two calls with independent ``seed`` values give an effective
    128-bit hash pair — use that where a 64-bit birthday bound is not
    acceptable (e.g. exact distinct counts at billion-key scale)."""
    import pyarrow as pa

    try:
        import polars as pl

        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if not isinstance(values, pa.Array):
            values = pa.array(values)
        return pl.from_arrow(values).hash(seed=seed).to_numpy().astype(np.uint64)
    except ImportError:  # pragma: no cover
        import pandas as pd

        if isinstance(values, (pa.Array, pa.ChunkedArray)):
            values = values.to_pandas()
        # hash_key is pandas' seeding mechanism (16-byte key string)
        return pd.util.hash_pandas_object(
            pd.Series(values), index=False, hash_key=f"{seed:016d}"[:16]
        ).to_numpy(dtype=np.uint64)


class KLL:
    """KLL streaming quantile sketch (Karnin, Lang & Liberty, "Optimal
    Quantile Approximation in Streams", FOCS 2016 — arXiv:1603.05346),
    implemented from the paper on numpy.

    A hierarchy of compactors: level h holds items each representing
    2^h input values; when a level overflows its (geometrically
    shrinking) capacity, it is sorted and a random odd/even half is
    promoted to level h+1. Normalized rank error is O(1/k) with high
    probability. Merge = levelwise concatenation + re-compaction —
    commutative and associative, so partials-as-data stay retry-safe.
    ``seed`` pins the compaction coin for deterministic tests.
    """

    C = 2.0 / 3.0  # level-capacity decay from the paper

    def __init__(self, k: int = 200, seed: int | None = None):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._rng = np.random.RandomState(seed)

    # -- internals ------------------------------------------------------
    def _cap(self, h: int) -> int:
        H = len(self.levels)
        return max(2, int(np.ceil(self.k * (self.C ** (H - 1 - h)))))

    def _total_cap(self) -> int:
        return sum(self._cap(h) for h in range(len(self.levels)))

    def _size(self) -> int:
        return sum(lv.size for lv in self.levels)

    def _compress(self) -> None:
        while self._size() > self._total_cap():
            for h in range(len(self.levels)):
                if self.levels[h].size > self._cap(h):
                    lv = np.sort(self.levels[h])
                    off = int(self._rng.randint(2))
                    promoted = lv[off::2]
                    self.levels[h] = np.empty(0, np.float64)
                    if h + 1 == len(self.levels):
                        self.levels.append(np.empty(0, np.float64))
                    self.levels[h + 1] = np.concatenate(
                        [self.levels[h + 1], promoted]
                    )
                    break
            else:
                break  # no level over its own cap: grow tolerated

    # -- building -------------------------------------------------------
    def add(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        values = values[~np.isnan(values)]
        if values.size == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], values])
        self.n += values.size
        self._compress()

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for h, lv in enumerate(other.levels):
            if lv.size:
                self.levels[h] = np.concatenate([self.levels[h], lv])
        self.n += other.n
        self._compress()
        return self

    # -- queries --------------------------------------------------------
    def count(self) -> int:
        return self.n

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([lv for lv in self.levels if lv.size] or [np.empty(0)])
        wts = np.concatenate(
            [np.full(lv.size, 2.0**h) for h, lv in enumerate(self.levels) if lv.size]
            or [np.empty(0)]
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        vals, wts = self._weighted()
        if vals.size == 0:
            return float("nan")
        cum = np.cumsum(wts)
        target = q * cum[-1]
        return float(vals[np.searchsorted(cum, target, side="left").clip(0, vals.size - 1)])

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(q) for q in qs])

    def rank(self, value: float) -> float:
        """Approximate normalized rank of ``value`` (fraction ≤ value)."""
        vals, wts = self._weighted()
        if vals.size == 0:
            return float("nan")
        i = np.searchsorted(vals, value, side="right")
        return float(wts[:i].sum() / wts.sum())

    # -- serialization --------------------------------------------------
    def to_bytes(self) -> bytes:
        head = struct.pack("<qqq", self.k, self.n, len(self.levels))
        sizes = struct.pack(f"<{len(self.levels)}q", *[lv.size for lv in self.levels])
        body = b"".join(np.ascontiguousarray(lv).tobytes() for lv in self.levels)
        return head + sizes + body

    @classmethod
    def from_bytes(cls, b: bytes) -> "KLL":
        k, n, H = struct.unpack_from("<qqq", b, 0)
        sizes = struct.unpack_from(f"<{H}q", b, 24)
        out = cls(k=k)
        out.n = n
        out.levels = []
        off = 24 + 8 * H
        for s in sizes:
            out.levels.append(np.frombuffer(b, np.float64, count=s, offset=off).copy())
            off += 8 * s
        return out


class CountMin:
    """Count-Min sketch (Cormode & Muthukrishnan, "An improved data
    stream summary: the count-min sketch and its applications",
    J. Algorithms 2005): approximate per-key frequencies with one-sided
    error — estimates NEVER undercount, and overcount by at most
    ε·N (ε = e/width) with probability ≥ 1-δ (δ = e^-depth).

    Mergeable (element-wise add), vectorized (``np.add.at`` scatter per
    row), serializable — the approximate heavy-hitter companion to the
    exact ``top_values`` operator for unbounded key domains. Row hashes
    derive from one 64-bit input hash via splitmix re-mixing (the same
    double-hash recipe as the Bloom filter)."""

    def __init__(self, width: int = 2048, depth: int = 5):
        if width < 8 or depth < 1:
            raise ValueError("width must be ≥ 8 and depth ≥ 1")
        self.width = int(width)
        self.depth = int(depth)
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n = 0  # total added count

    def _positions(self, h: np.ndarray, row: int) -> np.ndarray:
        from data_linter_ray.state.bloom import _mix

        h1 = h.astype(np.uint64, copy=False)
        h2 = _mix(h1) | np.uint64(1)
        return ((h1 + np.uint64(row) * h2) % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, h: np.ndarray, counts: np.ndarray | None = None) -> None:
        c = (
            np.ones(len(h), dtype=np.int64)
            if counts is None
            else counts.astype(np.int64, copy=False)
        )
        for r in range(self.depth):
            np.add.at(self.table[r], self._positions(h, r), c)
        self.n += int(c.sum())

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        """→ int64[n] upper-biased frequency estimates (never under)."""
        est = np.full(len(h), np.iinfo(np.int64).max, dtype=np.int64)
        for r in range(self.depth):
            np.minimum(est, self.table[r][self._positions(h, r)], out=est)
        return est

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("cannot merge sketches of different geometry")
        self.table += other.table
        self.n += other.n
        return self

    def to_bytes(self) -> bytes:
        head = struct.pack("<qqq", self.width, self.depth, self.n)
        return head + np.ascontiguousarray(self.table).tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "CountMin":
        w, d, n = struct.unpack("<qqq", b[:24])
        cm = cls(w, d)
        cm.table = np.frombuffer(b[24:], dtype=np.int64).reshape(d, w).copy()
        cm.n = n
        return cm


class ReservoirSample:
    """Uniform fixed-size sample as a MERGEABLE sketch (Vitter,
    "Random sampling with a reservoir", TOMS 1985; merge via the
    standard weighted union: draw each slot from either side with
    probability proportional to the streams' true counts).

    Determinism: all randomness derives from a caller-provided seed +
    the sketch's own counters, so identical inputs reproduce identical
    samples; merge order changes which items survive (inherent to any
    single-pass sample). Merge uniformity is exact while reservoirs
    hold their full streams and the standard mergeable-summaries
    approximation beyond that (see :meth:`merge`). Values are stored
    as an object array — KB-scale for scalar columns."""

    def __init__(self, k: int = 64, seed: int = 42):
        if k < 1:
            raise ValueError("k must be ≥ 1")
        self.k = int(k)
        self.seed = int(seed)
        self.values: list = []
        self.n = 0  # items seen

    def add(self, vals) -> None:
        rng = np.random.RandomState((self.seed ^ (self.n * 0x9E3779B9)) % (2**32))
        for v in vals:
            self.n += 1
            if len(self.values) < self.k:
                self.values.append(v)
            else:
                j = rng.randint(0, self.n)
                if j < self.k:
                    self.values[j] = v

    def merge(self, other: "ReservoirSample") -> "ReservoirSample":
        """Weighted without-replacement union: each draw takes from
        side 1 with probability r1/(r1+r2) where r1, r2 are the sides'
        REMAINING stream masses, and the consumed side's mass drops by
        its per-item weight (n_i / len(reservoir_i)).  The fixed-
        probability variant biases the merged sample (k=2, n1=n2=2:
        P(both from side 1) would be 1/4 instead of the correct 1/6);
        decrementing restores exact uniformity whenever the reservoirs
        hold their full streams (n_i ≤ k) and the standard mergeable-
        summaries approximation otherwise."""
        if self.k != other.k:
            raise ValueError("cannot merge reservoirs of different k")
        total = self.n + other.n
        if total == 0:
            return self
        rng = np.random.RandomState(
            (self.seed ^ (total * 0x85EBCA6B) ^ other.n) % (2**32)
        )
        merged: list = []
        mine, theirs = list(self.values), list(other.values)
        rng.shuffle(mine)
        rng.shuffle(theirs)
        r1, r2 = float(self.n), float(other.n)
        w1 = self.n / len(mine) if mine else 0.0
        w2 = other.n / len(theirs) if theirs else 0.0
        for _ in range(min(self.k, total)):
            take_mine = mine and (
                not theirs or rng.rand() < (r1 / (r1 + r2))
            )
            if take_mine:
                merged.append(mine.pop())
                r1 = max(0.0, r1 - w1)
            else:
                merged.append(theirs.pop())
                r2 = max(0.0, r2 - w2)
        self.values = merged
        self.n = total
        return self


class MisraGries:
    """Misra-Gries frequent-items summary (Misra & Gries, "Finding
    repeated elements", Sci. Comput. Program. 2(2), 1982): at most
    ``m`` (value, count) counters over a stream of n items. Guarantee:
    every value with true frequency > n/(m+1) is present, and each
    kept counter undercounts its true frequency by at most the total
    decrement D, where (m+1)*D <= n (every unit of decrement destroys
    m+1 units of stored mass and only n mass ever enters — the bound
    holds across ANY number of truncations and merges, which is what
    makes the summary mergeable with unchanged error: Agarwal, Cormode,
    Huang, Phillips, Wei & Yi, "Mergeable summaries", PODS 2012).

    Merge/ingest rule (vectorized — no per-item Python): pointwise
    counter sum, then if more than ``m`` counters remain, subtract the
    (m+1)-st largest counter value from all and keep the strictly
    positive ones. An exact value_counts table is itself a valid
    summary, so per-batch ingestion is one pandas groupby fold.
    """

    def __init__(self, m: int = 255):
        if m < 1:
            raise ValueError("m must be >= 1")
        self.m = int(m)
        self.counts = pd.Series(dtype=np.int64)
        self.n = 0  # total stream mass seen (for the n/(m+1) threshold)

    def _fold(self, other: pd.Series) -> None:
        # collapse duplicate labels FIRST: callers may concatenate
        # several exact partials (Ray blocks merge multiple per-batch
        # outputs), and pandas' non-unique-index add would split one
        # value's mass across counters — breaking the superset
        # guarantee (a heavy hitter could be truncated away)
        if not other.index.is_unique:
            other = other.groupby(level=0, sort=False).sum()
        s = (
            other
            if self.counts.empty
            else self.counts.add(other, fill_value=0).astype(np.int64)
        )
        if len(s) > self.m:
            # decrement by the (m+1)-st largest counter; values equal to
            # it die, so at most m strictly-greater counters survive
            e = np.partition(s.to_numpy(), -(self.m + 1))[-(self.m + 1)]
            s = s[s > e] - e
        self.counts = s

    def add_counts(self, values, counts) -> None:
        """Ingest an exact (values, counts) partial — e.g. one batch's
        ``value_counts`` output."""
        c = np.asarray(counts, dtype=np.int64)
        self._fold(pd.Series(c, index=pd.Index(values)))
        self.n += int(c.sum())

    def merge(self, other: "MisraGries") -> "MisraGries":
        if self.m != other.m:
            raise ValueError("cannot merge summaries of different m")
        self._fold(other.counts)
        self.n += other.n
        return self

    def candidates(self) -> list:
        """Values possibly exceeding the n/(m+1) frequency threshold —
        a guaranteed superset of the true heavy hitters."""
        return list(self.counts.index)

