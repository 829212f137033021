"""Vectorized MurmurHash3 (x86_32) over numpy arrays of strings/bytes.

The reference hashes every key k times with seeded murmur3
(/root/reference/spark/main.py:47 ``mmh3.hash(title, i)``;
/root/reference/hadoop/.../model/BloomFilter.java:54 ``MurmurHash``).
``mmh3`` is not available here, so this module ships a from-scratch
numpy implementation that processes an entire Arrow batch of keys per
call — the per-4-byte-block murmur loop runs ``ceil(maxlen/4)``
vectorized iterations over the whole batch instead of a Python loop
per key.

Index math is unsigned end-to-end (``np.uint32``/``np.uint64``), which
fixes two reference warts we must not copy (SURVEY.md §2.7):
  W1 — creation used ``abs(h) % m`` but validation used ``h % m``;
  W2 — ``Math.abs(Integer.MIN_VALUE)`` is negative in Java.

For k probe positions we use Kirsch-Mitzenmacher double hashing
(g_i = h1 + i*h2 mod m over uint64), which needs only two 64-bit base
hashes per key yet preserves the Bloom false-positive guarantee
(Kirsch & Mitzenmacher, "Less Hashing, Same Performance", ESA 2006).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pa_compute

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)
_MIX1 = np.uint32(0x85EBCA6B)
_MIX2 = np.uint32(0xC2B2AE35)
_FIVE = np.uint32(5)
_N1 = np.uint32(0xE6546B64)

# seed-derivation constants for the 64-bit composition / double-hashing family
_GOLDEN = 0x9E3779B9


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    r32 = np.uint32(r)
    return (x << r32) | (x >> np.uint32(32 - r))


def _fmix32(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint32(16))
    h = h * _MIX1
    h = h ^ (h >> np.uint32(13))
    h = h * _MIX2
    h = h ^ (h >> np.uint32(16))
    return h


# Keys longer than this are pre-digested to 16 bytes before the murmur
# block loop (whose iteration count is max key length / 4). Web-page
# texts can be hundreds of KB; without this a single long key stalls
# the whole batch.
LONG_KEY_THRESHOLD = 256


def _digest16(data: bytes) -> bytes:
    """16-byte vectorized digest of one long key (two seeded fold64s)."""
    pad = (-len(data)) % 8
    u = np.frombuffer(data + b"\x00" * pad, dtype=np.uint64)
    lo = fold64(u, seed=len(data))
    hi = fold64(u, seed=len(data) ^ 0x517CC1B727220A95)
    return lo.to_bytes(8, "little") + hi.to_bytes(8, "little")


def _digest16_batch(data: np.ndarray, starts: np.ndarray,
                    lengths: np.ndarray) -> np.ndarray:
    """uint8[n, 16] digests of n long keys in one vectorized pass —
    byte-identical to ``_digest16`` per key (property-tested), but the
    fold runs over ALL keys at once via ``bitwise_xor.reduceat``
    instead of a per-key Python call (~30x on a 300k-page corpus where
    every text exceeds LONG_KEY_THRESHOLD)."""
    n = len(starts)
    lens64 = lengths.astype(np.int64)
    words = (lens64 + 7) // 8                    # u64 words per key
    word_starts = np.r_[np.int64(0), np.cumsum(words[:-1])]
    buf = np.zeros(int(words.sum()) * 8, dtype=np.uint8)
    # per-key slice copy (a memcpy each — the cheap part); the FOLD
    # below is what was per-key numpy overhead before, now one pass
    for i in range(n):
        b0 = int(word_starts[i]) * 8
        s0 = int(starts[i])
        buf[b0:b0 + int(lens64[i])] = data[s0:s0 + int(lens64[i])]
    u = buf.view(np.uint64)
    pos = (np.arange(len(u), dtype=np.uint64)
           - np.repeat(word_starts, words).astype(np.uint64))
    out = np.empty((n, 8, 2), dtype=np.uint8)
    with np.errstate(over="ignore"):
        for j, seed_mix in enumerate((np.uint64(0),
                                      np.uint64(0x517CC1B727220A95))):
            seeds = np.repeat(lens64.astype(np.uint64) ^ seed_mix, words)
            elem = mix64(u ^ mix64(pos + seeds))
            h = np.bitwise_xor.reduceat(elem, word_starts)
            h = mix64(h ^ words.astype(np.uint64))
            out[:, :, j] = h.astype("<u8").view(np.uint8).reshape(n, 8)
    return out.transpose(0, 2, 1).reshape(n, 16)


def to_large_binary(values) -> "pa.Array":
    """Canonical ``large_binary`` encoding of a key batch.

    The single definition of "what bytes does a key hash as": str →
    utf-8, bytes → raw, int → decimal string (== Spark's CAST AS
    STRING), float/temporal → TypeError. Shared by the hash path
    (``to_bytes_matrix``) and by kernels that retain payloads
    (``core.sample``), so a payload always round-trips to the same tag.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        t = values.type
        if (pa.types.is_floating(t) or pa.types.is_temporal(t)
                or pa.types.is_boolean(t) or pa.types.is_decimal(t)):
            # same contract as the numpy branch below — not a raw
            # ArrowNotImplementedError from the large_binary cast
            raise TypeError(
                f"hashable keys must be str/bytes/int, got arrow {t}; "
                "cast float or temporal keys to a canonical string form "
                "first")
        if pa.types.is_integer(t):
            return values.cast(pa.large_string()).cast(pa.large_binary())
        return values.cast(pa.large_binary())
    dt = getattr(values, "dtype", None)
    if dt is not None and dt.kind in ("i", "u"):
        arr = (pa.array(np.asarray(values)).cast(pa.large_string())
               .cast(pa.large_binary()))
    elif dt is not None and dt.kind in ("f", "c", "b", "m", "M"):
        raise TypeError(
            f"hashable keys must be str/bytes/int, got {dt}; cast float "
            "or temporal keys to a canonical string form first")
    else:
        try:
            arr = pa.array(values, type=pa.large_binary())
        except (pa.ArrowNotImplementedError, pa.ArrowTypeError,
                pa.ArrowInvalid):
            # numpy '<U'/'S' arrays (and arrow ints from pandas
            # ArrowDtype): infer, then cast through string to binary
            inferred = pa.array(values)
            if pa.types.is_integer(inferred.type):
                inferred = inferred.cast(pa.large_string())
            arr = inferred.cast(pa.large_binary())
    if isinstance(arr, pa.ChunkedArray):
        # >2 GB batches arrive chunked; large_binary offsets are 64-bit
        # so a single combined array is always representable
        arr = arr.combine_chunks()
    return arr


def drop_null_keys(values) -> "pa.Array":
    """Canonical large_binary key batch with nulls REMOVED — the one
    null rule for every key-kernel update path (SQL semantics: null is
    not a value; it joins, counts, and matches nothing). Returns an
    arrow array to_bytes_matrix accepts directly, so conversion
    happens once."""
    arr = to_large_binary(values)
    return arr.drop_null() if arr.null_count else arr


def valid_key_mask(values) -> tuple["pa.Array", np.ndarray | None]:
    """(large_binary array, validity mask | None): mask is None when
    no nulls — for aligned update/query paths (weighted counts,
    membership) that must keep row positions."""
    arr = to_large_binary(values)
    if not arr.null_count:
        return arr, None
    return arr, np.asarray(pa_compute.is_valid(arr))


def to_bytes_matrix(values) -> tuple[np.ndarray, np.ndarray]:
    """Encode a batch of str/bytes into a zero-padded uint8 matrix + lengths.

    Accepts a pandas Series, numpy array, or list. Returns
    ``(mat[n, L], lengths[n])`` with L a multiple of 4 (>= 4).
    Keys longer than LONG_KEY_THRESHOLD are replaced by a 16-byte
    vectorized digest (deterministic per key contents, so Bloom/HLL/CMS
    semantics are unchanged; only the hash family differs for long keys).

    Binary-safe: encoding goes through a pyarrow large_binary array
    (utf-8 for str, raw bytes for bytes, per-element for mixed batches),
    so keys may contain embedded or trailing NUL bytes — length is part
    of the murmur finalizer, so b"a" and b"a\\x00" hash differently.
    The ragged->padded scatter is pure vectorized numpy over the arrow
    offsets buffer; no per-key Python loop.

    Integer keys (id columns) canonicalize to their decimal-string
    bytes via an arrow cast — the same representation Spark's
    ``CAST(col AS STRING)`` produces, so a sketch fed int64 values
    Python-side answers probes for keys stringified JVM-side and vice
    versa. Float keys stay a TypeError: binary float representations
    are ambiguous (0.1 + 0.2 != 0.3); cast explicitly to a canonical
    string/int form before sketching.
    """
    arr = to_large_binary(values)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 4), dtype=np.uint8), np.zeros(0, dtype=np.int64)
    if arr.null_count:
        # hashing null as b"" would conflate null with the genuine
        # empty string (distinct counts / membership silently wrong);
        # update paths drop nulls via drop_null_keys, query paths must
        # mask them out — reaching here with a null is a caller bug
        raise ValueError(
            "null keys cannot be hashed — kernel update paths drop "
            "them (drop_null_keys); mask nulls out before querying")
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=np.int64)[arr.offset:arr.offset + n + 1]
    data = (np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None
            else np.zeros(0, dtype=np.uint8))
    starts = offsets[:-1]
    lengths = np.diff(offsets)
    long_rows = np.flatnonzero(lengths > LONG_KEY_THRESHOLD)
    if len(long_rows):
        eff_lengths = lengths.copy()
        eff_lengths[long_rows] = 16
    else:
        eff_lengths = lengths
    L4 = max(4, int(-(-eff_lengths.max() // 4)) * 4)
    if len(data) == 0:
        return np.zeros((n, L4), dtype=np.uint8), eff_lengths.astype(np.int64)
    # fixed-window gather: row r reads data[starts[r] : starts[r]+L4]
    # (clipped), then positions beyond the row's length are zeroed.
    # Gather one COLUMN at a time reusing a single n-sized index temp:
    # the obvious one-shot data[starts[:,None]+cols[None,:]] allocates
    # an n x L4 int64 index matrix whose first-touch page faults cost
    # seconds per cold Spark worker on large batches (measured 7s for
    # a 260k x 28 batch; the column loop is <0.1s)
    mat = np.zeros((n, L4), dtype=np.uint8)
    limit = np.int64(len(data) - 1)
    idx = np.empty(n, dtype=np.int64)
    for j in range(L4):
        np.minimum(starts + np.int64(j), limit, out=idx)
        mat[:, j] = data[idx]
    cols = np.arange(L4, dtype=np.int64)
    mat[cols[None, :] >= eff_lengths[:, None]] = 0
    if len(long_rows):
        mat[long_rows, :16] = _digest16_batch(
            data, starts[long_rows], lengths[long_rows])
    return np.ascontiguousarray(mat), eff_lengths.astype(np.int64)


def murmur3_32_mat(mat: np.ndarray, lengths: np.ndarray, seed: int) -> np.ndarray:
    """murmur3 x86_32 of each row of a padded byte matrix. Returns uint32[n]."""
    n, L4 = mat.shape
    if n == 0:
        return np.zeros(0, dtype=np.uint32)
    blocks = np.ascontiguousarray(mat).view("<u4").reshape(n, L4 // 4)
    h = np.full(n, np.uint32(seed & 0xFFFFFFFF), dtype=np.uint32)
    nblocks = L4 // 4
    with np.errstate(over="ignore"):
        for i in range(nblocks):
            full = lengths >= 4 * (i + 1)
            if not full.any():
                break
            k1 = blocks[:, i] * _C1
            k1 = _rotl32(k1, 15)
            k1 = k1 * _C2
            hx = h ^ k1
            hx = _rotl32(hx, 13)
            hx = hx * _FIVE + _N1
            h = np.where(full, hx, h)
        # tail: 1-3 trailing bytes; padding is zero so masking is belt+braces
        tail_len = (lengths & 3).astype(np.uint32)
        has_tail = tail_len > 0
        if has_tail.any():
            idx = np.minimum(lengths >> 2, nblocks - 1).astype(np.int64)
            k = blocks[np.arange(n), idx]
            mask = ((np.uint64(1) << (np.uint64(8) * tail_len.astype(np.uint64)))
                    - np.uint64(1)).astype(np.uint32)
            k1 = (k & mask) * _C1
            k1 = _rotl32(k1, 15)
            k1 = k1 * _C2
            h = np.where(has_tail, h ^ k1, h)
        h = h ^ lengths.astype(np.uint32)
        h = _fmix32(h)
    return h


def murmur3_32(values, seed: int = 0) -> np.ndarray:
    """Vectorized murmur3 x86_32 over a batch of str/bytes. uint32[n]."""
    mat, lengths = to_bytes_matrix(values)
    return murmur3_32_mat(mat, lengths, seed)


def hash64_pair(values, seed: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Two 64-bit hashes per key for Kirsch-Mitzenmacher double hashing.

    h1 is composed from two seeded murmur3_32 runs; h2 is the splitmix64
    finalizer of h1, forced odd so the family never degenerates mod a
    power of two. Deriving h2 from h1 (standard practice — cf. Guava
    splitting one murmur128 into two halves) halves the hash passes per
    key; independence holds except on 64-bit h1 collisions, which are
    negligible below ~2^32 distinct keys per filter.
    """
    h1 = hash64(values, seed)
    h2 = mix64(h1 ^ np.uint64(_GOLDEN)) | np.uint64(1)
    return h1, h2


def hash64(values, seed: int = 0) -> np.ndarray:
    """One 64-bit hash per key (for HLL register/rho extraction)."""
    mat, lengths = to_bytes_matrix(values)
    a = murmur3_32_mat(mat, lengths, seed).astype(np.uint64)
    b = murmur3_32_mat(mat, lengths, seed ^ _GOLDEN).astype(np.uint64)
    return (a << np.uint64(32)) | b


def km_expand(h1: np.ndarray, h2: np.ndarray, k: int) -> np.ndarray:
    """Kirsch-Mitzenmacher expansion: uint64[n, k] = h1 + i*h2
    (wrapping). THE one definition of the probe family — Bloom, CMS,
    and count sketch all index through here so a change propagates
    everywhere at once."""
    i = np.arange(k, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return h1[:, None] + i[None, :] * h2[:, None]


def km_indices(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> np.ndarray:
    """uint64[n, k] = (h1 + i*h2) % m."""
    return km_expand(h1, h2, k) % np.uint64(m)


def probe_indices(values, k: int, m: int, seed: int = 0) -> np.ndarray:
    """k Bloom bit positions per key: uint64[n, k] = (h1 + i*h2) % m."""
    h1, h2 = hash64_pair(values, seed)
    return km_indices(h1, h2, k, m)


def mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, elementwise over uint64 arrays."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def fold64(arr: np.ndarray, seed: int = 0) -> int:
    """Deterministic 64-bit digest of a numeric array (order-sensitive).

    One vectorized mix pass + xor-reduce — O(n) with no Python loop,
    unlike the byte-string murmur path. Used for e.g. KLL's
    deterministic compaction offset.
    """
    u = np.ascontiguousarray(arr).view(np.uint64).reshape(-1)
    if len(u) == 0:
        return int(mix64(np.array([seed], dtype=np.uint64))[0])
    with np.errstate(over="ignore"):
        idx = np.arange(len(u), dtype=np.uint64) + np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
        h = np.bitwise_xor.reduce(mix64(u ^ mix64(idx)))
        return int(mix64(np.array([h ^ np.uint64(len(u))], dtype=np.uint64))[0])


def murmur3_32_scalar(data: bytes, seed: int = 0) -> int:
    """Reference scalar implementation (tests compare vectorized vs this)."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    length = len(data)
    h = seed & 0xFFFFFFFF
    rounded = length & ~3
    for i in range(0, rounded, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[rounded:]
    if tail:
        k = int.from_bytes(tail.ljust(4, b"\0"), "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= length
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h
