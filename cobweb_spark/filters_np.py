"""Vectorized bloom + cuckoo filters (pure numpy, no Spark dependency).

The seen-set prefilter tier (north rule): per-shard bloom bitsets keyed by
xxhash64(canonical-url), with a cuckoo-filter overflow that absorbs keys
beyond the bloom's sizing capacity (the cuckoo also supports deletion,
which blooms cannot — the audit/rollback path). Both structures serialize
to bytes so they live as binary columns in a ``filters`` table and are
maintained / probed inside Arrow-batched pandas UDFs.

Correctness stance: a positive from either structure only routes the key
into the exact anti-join; a false positive can never drop a URL. A false
*negative* would — so inserts are strict: every key lands in the bloom or
(on bloom saturation) in the cuckoo; if a cuckoo insert fails after the
kick bound, we grow the cuckoo (never silently drop).

All hashing derives from the 64-bit input key via splitmix64 mixing —
vectorized numpy throughout, no per-element Python.
"""

from __future__ import annotations

import math

import numpy as np

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain constant mix)."""
    x = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    x = ((x ^ (x >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)).astype(_U64)
    x = ((x ^ (x >> _U64(27))) * _U64(0x94D049BB133111EB)).astype(_U64)
    return (x ^ (x >> _U64(31))).astype(_U64)


class BloomFilter:
    """Fixed-size bloom over uint64 keys; k derived from target fpp."""

    def __init__(self, capacity: int, fpp: float = 0.01, bits: np.ndarray | None = None):
        self.capacity = int(capacity)
        self.fpp = float(fpp)
        m = int(-capacity * math.log(fpp) / (math.log(2) ** 2))
        self.m = max(64, (m + 63) // 64 * 64)
        self.k = max(1, round(self.m / capacity * math.log(2)))
        if bits is None:
            self.bits = np.zeros(self.m // 8, dtype=np.uint8)
        else:
            self.bits = bits
        self.n_keys = 0

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) bit positions via double hashing h1 + i*h2 mod m."""
        keys = keys.astype(_U64)
        h1 = _splitmix64(keys)
        h2 = _splitmix64(h1) | _U64(1)
        i = np.arange(self.k, dtype=_U64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % _U64(self.m)).astype(
            np.int64
        )

    def add(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        self.n_keys += len(keys)

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys))
        hit = (self.bits[pos >> 3] >> (pos & 7)) & 1
        return hit.all(axis=0).astype(bool)

    @property
    def saturated(self) -> bool:
        return self.n_keys >= self.capacity

    def to_bytes(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def from_bytes(
        cls, data: bytes, capacity: int, fpp: float, n_keys: int
    ) -> "BloomFilter":
        bf = cls(capacity, fpp, bits=np.frombuffer(data, dtype=np.uint8).copy())
        bf.n_keys = n_keys
        return bf


class CuckooFilter:
    """Bucketed cuckoo filter: 16-bit fingerprints, 4 slots per bucket.

    Supports insert / query / delete over uint64 key arrays. When the kick
    bound is exceeded the displaced fingerprint goes to a stash (checked on
    every query) — a false negative is the one unacceptable outcome, and a
    cuckoo resize cannot relocate fingerprints correctly (bucket indices
    are key-derived), so stash-on-overflow is the correct fallback.
    """

    SLOTS = 4
    MAX_KICKS = 128

    def __init__(
        self,
        n_buckets: int = 1 << 12,
        table: np.ndarray | None = None,
        stash: np.ndarray | None = None,
    ):
        self.n_buckets = int(n_buckets)
        if table is None:
            self.table = np.zeros(
                (self.n_buckets, self.SLOTS), dtype=np.uint16
            )
        else:
            self.table = table.reshape(self.n_buckets, self.SLOTS)
        self.stash = (
            stash if stash is not None else np.zeros(0, dtype=np.uint16)
        )
        self.n_items = int((self.table != 0).sum()) + len(self.stash)

    def _fp_and_index(self, keys: np.ndarray):
        keys = np.asarray(keys, dtype=_U64)
        h = _splitmix64(keys)
        fp = (h & _U64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks empty slot
        i1 = (h >> _U64(16)) % _U64(self.n_buckets)
        return fp, i1.astype(np.int64)

    def _alt_index(self, i: np.ndarray, fp: np.ndarray) -> np.ndarray:
        mix = _splitmix64(fp.astype(_U64))
        return ((i.astype(_U64) ^ mix) % _U64(self.n_buckets)).astype(
            np.int64
        )

    def insert(self, keys: np.ndarray) -> None:
        fp, i1 = self._fp_and_index(keys)
        for f, a in zip(fp, i1):
            self._insert_one(int(f), int(a))
        self.n_items += len(keys)

    def _insert_one(self, f: int, i: int) -> None:
        import random

        rng = random.Random(f ^ i)  # deterministic kick choice
        for idx in (i, self._alt_index(np.array([i]), np.array([f], dtype=np.uint16))[0]):
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = f
                return
        cur_i, cur_f = i, f
        for _ in range(self.MAX_KICKS):
            slot = rng.randrange(self.SLOTS)
            cur_f, self.table[cur_i, slot] = (
                int(self.table[cur_i, slot]),
                cur_f,
            )
            cur_i = int(
                self._alt_index(
                    np.array([cur_i]), np.array([cur_f], dtype=np.uint16)
                )[0]
            )
            row = self.table[cur_i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur_f
                return
        # kick bound exceeded: stash the displaced fingerprint
        self.stash = np.append(self.stash, np.uint16(cur_f))

    def contains(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1 = self._fp_and_index(keys)
        i2 = self._alt_index(i1, fp)
        hit = (self.table[i1] == fp[:, None]).any(axis=1)
        hit |= (self.table[i2] == fp[:, None]).any(axis=1)
        if len(self.stash):
            hit |= np.isin(fp, self.stash)
        return hit

    def delete(self, keys: np.ndarray) -> np.ndarray:
        """Remove one fingerprint occurrence per key; returns removed mask."""
        fp, i1 = self._fp_and_index(keys)
        i2 = self._alt_index(i1, fp)
        removed = np.zeros(len(fp), dtype=bool)
        for n, (f, a, b) in enumerate(zip(fp, i1, i2)):
            for idx in (a, b):
                row = self.table[idx]
                hit = np.where(row == f)[0]
                if len(hit):
                    row[hit[0]] = 0
                    removed[n] = True
                    self.n_items -= 1
                    break
            else:
                shit = np.where(self.stash == f)[0]
                if len(shit):
                    self.stash = np.delete(self.stash, shit[0])
                    removed[n] = True
                    self.n_items -= 1
        return removed

    def to_bytes(self) -> bytes:
        header = np.array([len(self.stash)], dtype=np.uint32).tobytes()
        return header + self.stash.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        n_stash = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
        off = 4 + 2 * n_stash
        stash = np.frombuffer(data[4:off], dtype=np.uint16).copy()
        arr = np.frombuffer(data[off:], dtype=np.uint16).copy()
        n_buckets = len(arr) // cls.SLOTS
        return cls(n_buckets, table=arr, stash=stash)


class ShardFilter:
    """One shard's bloom + cuckoo overflow pair."""

    def __init__(self, capacity: int, fpp: float):
        self.bloom = BloomFilter(capacity, fpp)
        self.cuckoo = CuckooFilter(max(1 << 8, capacity // 64))

    def add(self, keys: np.ndarray) -> None:
        keys = np.asarray(keys, dtype=np.int64).view(_U64)
        room = self.bloom.capacity - self.bloom.n_keys
        if room >= len(keys):
            self.bloom.add(keys)
        else:
            self.bloom.add(keys[:room])
            self.cuckoo.insert(keys[room:])

    def contains(self, keys: np.ndarray) -> np.ndarray:
        keys = np.asarray(keys, dtype=np.int64).view(_U64)
        hit = self.bloom.contains(keys)
        if self.cuckoo.n_items:
            hit |= self.cuckoo.contains(keys)
        return hit

    def to_state(self) -> tuple[bytes, int, bytes]:
        return (
            self.bloom.to_bytes(),
            self.bloom.n_keys,
            self.cuckoo.to_bytes(),
        )

    @classmethod
    def from_state(
        cls,
        bloom_bytes: bytes,
        n_keys: int,
        cuckoo_bytes: bytes,
        capacity: int,
        fpp: float,
    ) -> "ShardFilter":
        sf = cls.__new__(cls)
        sf.bloom = BloomFilter.from_bytes(bloom_bytes, capacity, fpp, n_keys)
        sf.cuckoo = CuckooFilter.from_bytes(cuckoo_bytes)
        return sf
