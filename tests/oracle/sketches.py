"""Naive oracle restatements of the sketch / heuristic operators
(SURVEY.md section 5.3 discipline, same as the extraction oracle).

Each function here re-derives an operator's output directly from its
frozen definition — plain dicts, loops and union-find, no Ray, no
bucketed-groupby machinery — so golden parquet generated from this
module (``fixtures/make_sketch_golden.py``) independently checks the
engine's distributed implementations in :mod:`rayxt.dedup`,
:mod:`rayxt.ann`, :mod:`rayxt.text` and :mod:`rayxt.multimodal`.

The numeric CONSTANTS (hash construction, permutation seeds, band
layout, hyperplane seed) are part of the frozen operator definitions
and are restated here; tests assert engine/oracle agreement so drift in
either side is caught.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

import numpy as np

# -- shared hash primitive (frozen definition) ------------------------------


def sha1_int64(s: str) -> int:
    return int.from_bytes(hashlib.sha1(s.encode("utf-8")).digest()[:8], "big") >> 1


# -- MinHash + LSH ----------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_U64 = 1 << 64


def minhash_perm_params(num_perm: int = 64, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return [int(x) % _U64 for x in a], [int(x) % _U64 for x in b]


def token_shingles(text: str, k: int) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else {""}
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def minhash_signature(text: str, a: list[int], b: list[int], k: int = 3) -> list[int]:
    """Per-permutation min of (shingle_hash * a + b) with uint64
    wrap-around, then >> 1 — computed slot by slot in plain Python."""
    hashes = [sha1_int64(s) for s in token_shingles(text, k)]
    sig = []
    for ai, bi in zip(a, b):
        best = min(((h * ai + bi) % _U64) for h in hashes)
        sig.append(best >> 1)
    return sig


def oracle_minhash_pairs(ids, texts, *, k: int = 3, num_perm: int = 64,
                         bands: int = 16, threshold: float = 0.8,
                         max_bucket: int = 64) -> list[tuple[int, int, float]]:
    """All (id_a < id_b, est_jaccard) pairs that share at least one LSH
    band bucket (membership capped at ``max_bucket`` smallest ids) and
    whose signature agreement >= threshold."""
    a, b = minhash_perm_params(num_perm)
    rows_per_band = num_perm // bands
    sigs: dict[int, list[int]] = {}
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, text in zip(ids, texts):
        sig = minhash_signature(text or "", a, b, k)
        sigs[i] = sig
        for band in range(bands):
            seg = sig[band * rows_per_band:(band + 1) * rows_per_band]
            key = sha1_int64(f"{band}:" + ",".join(map(str, seg)))
            buckets[(band, key)].append(i)
    pairs: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        members = sorted(members)[:max_bucket]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                ia, ib = members[x], members[y]
                if (ia, ib) in pairs:
                    continue
                agree = sum(1 for u, v in zip(sigs[ia], sigs[ib]) if u == v)
                est = agree / num_perm
                if est >= threshold:
                    pairs[(ia, ib)] = round(est, 6)
    return sorted((ia, ib, j) for (ia, ib), j in pairs.items())


def oracle_ngram_jaccard_pairs(ids, texts, *, k: int = 3, num_perm: int = 64,
                               bands: int = 16, threshold: float = 0.7,
                               max_bucket: int = 64) -> list[tuple[int, int, float]]:
    """All (id_a < id_b, jaccard) pairs that share at least one LSH band
    bucket (same candidate generation as ``oracle_minhash_pairs``) whose
    EXACT Jaccard over 64-bit-hashed k-token shingle sets >= threshold —
    plain Python sets, no arrays."""
    a, b = minhash_perm_params(num_perm)
    rows_per_band = num_perm // bands
    shingle_sets: dict[int, set[int]] = {}
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, text in zip(ids, texts):
        shingle_sets[i] = {sha1_int64(s) for s in token_shingles(text or "", k)}
        sig = minhash_signature(text or "", a, b, k)
        for band in range(bands):
            seg = sig[band * rows_per_band:(band + 1) * rows_per_band]
            key = sha1_int64(f"{band}:" + ",".join(map(str, seg)))
            buckets[(band, key)].append(i)
    pairs: dict[tuple[int, int], float] = {}
    for members in buckets.values():
        members = sorted(members)[:max_bucket]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                ia, ib = members[x], members[y]
                if (ia, ib) in pairs:
                    continue
                sa, sb = shingle_sets[ia], shingle_sets[ib]
                union = len(sa | sb)
                jac = (len(sa & sb) / union) if union else 1.0
                if round(jac, 6) >= threshold:
                    pairs[(ia, ib)] = round(jac, 6)
    return sorted((ia, ib, j) for (ia, ib), j in pairs.items())


# -- SimHash ----------------------------------------------------------------


def oracle_simhash(text: str, bits: int = 64) -> int:
    toks = set(text.split())
    if not toks:
        return 0
    acc = [0] * bits
    for t in toks:
        h = sha1_int64(t)
        for bit in range(bits):
            acc[bit] += 1 if (h >> bit) & 1 else -1
    out = 0
    for bit in range(bits):
        if acc[bit] > 0:
            out |= 1 << bit
    return out


def oracle_simhash_pairs(ids, texts, *, max_hamming: int = 3,
                         max_bucket: int = 64) -> list[tuple[int, int, int]]:
    """Pairs sharing at least one 16-bit band (4 bands over 64 bits,
    membership capped) with hamming distance <= max_hamming."""
    hs = {i: oracle_simhash(t or "") for i, t in zip(ids, texts)}
    buckets: dict[tuple[int, int], list[int]] = defaultdict(list)
    for i, h in hs.items():
        for band in range(4):
            buckets[(band, (h >> (band * 16)) & 0xFFFF)].append(i)
    pairs: dict[tuple[int, int], int] = {}
    for members in buckets.values():
        members = sorted(members)[:max_bucket]
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                ia, ib = members[x], members[y]
                if (ia, ib) in pairs:
                    continue
                d = bin(hs[ia] ^ hs[ib]).count("1")
                if d <= max_hamming:
                    pairs[(ia, ib)] = d
    return sorted((ia, ib, d) for (ia, ib), d in pairs.items())


# -- connected components (union-find) --------------------------------------


def oracle_components(pairs) -> list[tuple[int, int]]:
    """(id, cluster_id=min member id of its component) for every id
    appearing in the (id_a, id_b) pair list — classic union-find."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ia, ib, *_ in pairs:
        parent.setdefault(ia, ia)
        parent.setdefault(ib, ib)
        ra, rb = find(ia), find(ib)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return sorted((i, find(i)) for i in parent)


# -- language ID / fingerprint (heuristics restated) ------------------------

_LANG_PROFILES = [
    ("en", {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"}),
    ("de", {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"}),
    ("fr", {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"}),
    ("es", {"el", "la", "los", "y", "es", "un", "una", "que", "de", "por"}),
]


def oracle_langid(text: str) -> str:
    import re

    if not text:
        return ""
    cjk = re.findall(r"[一-鿿぀-ヿ]", text)
    if len(cjk) * 2 > len(text) * 0.05:
        return "zh"
    words = [w.lower() for w in re.findall(r"[a-zA-Z]+", text[:4000])]
    if not words:
        return ""
    best, best_score = "", 0
    for lang, stops in _LANG_PROFILES:  # tie goes to the earlier profile
        score = sum(1 for w in words if w in stops)
        if score > best_score:
            best, best_score = lang, score
    return best if best_score > 0 else "en"


def oracle_repetition(text: str) -> tuple:
    """Independent restatement of the frozen repetition signals
    (``rayxt.text.repetition_profile``): most-frequent-word fraction,
    most-frequent-bigram fraction, duplicated-trigram occurrence
    fraction, each round(..., 6), over whitespace tokens."""
    from collections import Counter

    words = text.split()
    n = len(words)
    if n == 0:
        return 0.0, 0.0, 0.0
    max_word = round(Counter(words).most_common(1)[0][1] / n, 6)
    if n < 2:
        return max_word, 0.0, 0.0
    c2 = Counter(zip(words, words[1:]))
    top2 = round(c2.most_common(1)[0][1] / (n - 1), 6)
    if n < 3:
        return max_word, top2, 0.0
    c3 = Counter(zip(words, words[1:], words[2:]))
    dup3 = round(sum(c for c in c3.values() if c > 1) / (n - 2), 6)
    return max_word, top2, dup3


def oracle_compression(text: str):
    """DEFLATE ratio restated via the incremental compressobj API:
    compressed-byte count over utf-8 byte count at zlib level 6,
    rounded to 6 places; empty -> None."""
    import zlib

    raw = text.encode("utf-8")
    if not raw:
        return None
    co = zlib.compressobj(6)
    n = len(co.compress(raw)) + len(co.flush())
    return round(n / len(raw), 6)


def oracle_temperature_mix(ids, domains, *, alpha: float,
                           target_rows: int, a: int = 1103515245,
                           b: int = 12345):
    """Temperature-mix sampling restated with Counter + math.pow +
    pure-python-int hashing: p_d = c^alpha / sum (sorted-domain
    summation order), rate_d = min(1, target*p/c), keep when
    ((id %% p)*a+b) %% p < int(rate*p), p = 2^31-1; null domains are
    dropped.  Returns kept (id, domain) pairs in input order."""
    import math
    from collections import Counter

    p = (1 << 31) - 1
    counts = Counter(d for d in domains if d is not None)
    weights = {d: math.pow(counts[d], alpha) for d in sorted(counts)}
    total = 0.0
    for d in sorted(weights):
        total += weights[d]
    thr = {d: int(min(1.0, target_rows * (weights[d] / total) / counts[d])
                  * p)
           for d in weights}
    out = []
    for i, d in zip(ids, domains):
        if d is None:
            continue
        if ((int(i) % p) * a + b) % p < thr[d]:
            out.append((int(i), d))
    return out


def oracle_fingerprint(text: str) -> str:
    """FNV-1a over token bytes with a 0x20 separator step, hex-formatted."""
    h = 14695981039346656037
    for tok in text.split():
        for byte in tok.encode("utf-8"):
            h = ((h ^ byte) * 1099511628211) % _U64
        h = ((h ^ 0x20) * 1099511628211) % _U64
    return format(h, "016x")


# -- ANN (hyperplane LSH restated) ------------------------------------------


def oracle_lsh_topk(ids, vecs, queries, *, k: int = 5, n_planes: int = 8,
                    n_tables: int = 4, probe_radius: int = 2,
                    seed: int = 11) -> list[tuple[int, int, int, float]]:
    """(query_id, id, rank, cos) rows: exact cosine top-k restricted to
    vectors whose sign-bucket in ANY hyperplane table lies within
    hamming distance ``probe_radius`` of some query's bucket there."""
    from itertools import combinations

    planes = np.random.default_rng(seed).standard_normal(
        (n_tables, n_planes, len(vecs[0]))
    )

    def norm(v):
        v = np.asarray(v, dtype=np.float64)
        n = np.linalg.norm(v)
        return v / (n if n else 1.0)

    def bucket(v, table) -> int:
        return sum(1 << j for j in range(n_planes) if float(v @ table[j]) > 0)

    def probes(b: int) -> set[int]:
        out = {b}
        for dist in range(1, probe_radius + 1):
            for flips in combinations(range(n_planes), dist):
                x = b
                for f in flips:
                    x ^= 1 << f
                out.add(x)
        return out

    qn = [(int(qid), norm(qv)) for qid, qv in queries]
    qprobes = []
    for table in planes:
        p: set[int] = set()
        for _, qv in qn:
            p |= probes(bucket(qv, table))
        qprobes.append(p)
    cand = [
        (i, nv) for i, nv in ((i, norm(v)) for i, v in zip(ids, vecs))
        if any(bucket(nv, table) in qp for table, qp in zip(planes, qprobes))
    ]
    out = []
    for qid, qv in qn:
        scored = sorted(
            ((float(qv @ v), int(i)) for i, v in cand),
            key=lambda t: (-t[0], t[1]),
        )[:k]
        for rank, (cos, i) in enumerate(scored, 1):
            out.append((qid, i, rank, round(cos, 6)))
    return out


def oracle_ivf_topk(ids, vecs, lists, queries, *, k: int = 5,
                    nprobe: int = 3) -> list[tuple[int, int, int, float]]:
    """(query_id, id, rank, cos): exact cosine top-k restricted to
    members of the probe-set union — each query's ``nprobe`` nearest
    lists by cosine against the per-list centroid (float64 mean rounded
    to 6, matching the engine's centroid table; ties toward the
    smaller list id)."""
    import numpy as _np

    def norm(v):
        v = _np.asarray(v, dtype=_np.float64)
        n = _np.linalg.norm(v)
        return v / (n if n else 1.0)

    by_list: dict = defaultdict(list)
    for i, v, li in zip(ids, vecs, lists):
        by_list[li].append(_np.asarray(v, dtype=_np.float64))
    cents = {li: _np.round(_np.mean(_np.stack(vs), axis=0), 6)
             for li, vs in by_list.items()}
    list_ids = sorted(cents)
    cmat = _np.stack([norm(cents[li]) for li in list_ids])

    probe: set = set()
    for _, qv in queries:
        sims = cmat @ norm(qv)
        order = sorted(range(len(list_ids)),
                       key=lambda j: (-sims[j], list_ids[j]))[:nprobe]
        probe.update(list_ids[j] for j in order)

    cand = [(int(i), norm(v)) for i, v, li in zip(ids, vecs, lists)
            if li in probe]
    out = []
    for qid, qv in queries:
        qn = norm(qv)
        scored = sorted(((float(qn @ v), i) for i, v in cand),
                        key=lambda t: (-t[0], t[1]))[:k]
        for rank, (cos, i) in enumerate(scored, 1):
            out.append((int(qid), i, rank, round(cos, 6)))
    return out


# -- media decode -----------------------------------------------------------
# The media oracle is the fixture generator's ground truth
# (fixtures/gen_media.py::media_ground_truth): expected stats are
# computed from the SOURCE arrays before PNG/WAV/RAYX encoding, so the
# engine's decoders are checked by inverting a real encoding — no
# second decoder implementation needed here.


# -- DDSketch grouped quantiles --------------------------------------------
# Frozen definition (mirrors rayxt.windows.group_quantiles_sketch):
# gamma = (1+alpha)/(1-alpha); bucket idx = ceil(log(|v|)/log(gamma))
# computed in float64 via np.log (array kernel on BOTH sides so bucket
# boundaries are bit-identical); estimate = +-2*gamma^idx/(gamma+1);
# quantile = estimate of the bucket containing rank floor(q*(n-1)).


def ddsketch_group_quantiles(rows, *, qs=(0.5, 0.95), alpha=0.01, ndigits=6):
    """rows: iterable of (key, value). Returns {key: [q_est, ...]}."""
    gamma = (1.0 + alpha) / (1.0 - alpha)
    ln_gamma = np.log(gamma)
    by_key: dict = defaultdict(list)
    for k, v in rows:
        by_key[k].append(float(v))
    out = {}
    for k, vals in by_key.items():
        arr = np.asarray(vals, dtype=np.float64)
        buckets: dict = defaultdict(int)
        nz = arr != 0
        idxs = np.zeros(len(arr), dtype=np.int64)
        mags = np.abs(arr[nz])
        idxs[nz] = np.ceil(np.log(mags) / ln_gamma).astype(np.int64)
        for v, i in zip(arr, idxs):
            kind = 0 if v == 0 else (1 if v > 0 else 2)
            buckets[(kind, int(i) if kind else 0)] += 1
        # value order: negatives by descending idx, zero, positives asc
        ordered = sorted(
            buckets.items(),
            key=lambda kv: ((0, -kv[0][1]) if kv[0][0] == 2
                            else (1, 0) if kv[0][0] == 0
                            else (2, kv[0][1])),
        )
        total = len(arr)
        ests = []
        for q in qs:
            rank = int(q * (total - 1))
            cum = 0
            est = 0.0
            for (kind, idx), c in ordered:
                cum += c
                if cum > rank:
                    if kind == 0:
                        est = 0.0
                    else:
                        est = 2.0 * gamma ** idx / (gamma + 1.0)
                        if kind == 2:
                            est = -est
                    break
            ests.append(round(float(est), ndigits))
        out[k] = ests
    return out


# -- HyperLogLog grouped distinct count -------------------------------------
# Frozen definition (mirrors rayxt.sketches.group_distinct_hll):
# splitmix64 finalizer; register = top p bits, rank rho = (64-p) -
# bit_length(low bits) + 1; estimator computes sum(2^-M_j) as the EXACT
# integer sum(2^(R - M_j)) with R = 64-p+1, so the only float ops are a
# fixed scalar sequence (no accumulation-order sensitivity); linear
# counting when raw <= 2.5m and empty registers remain.

_SM1 = 0x9E3779B97F4A7C15
_SM2 = 0xBF58476D1CE4E5B9
_SM3 = 0x94D049BB133111EB
_M64 = (1 << 64) - 1


def oracle_splitmix64(x: int) -> int:
    z = (x + _SM1) & _M64
    z = ((z ^ (z >> 30)) * _SM2) & _M64
    z = ((z ^ (z >> 27)) * _SM3) & _M64
    return z ^ (z >> 31)


def oracle_hll_distinct(keys, values, p: int = 10) -> dict:
    import math

    m = 1 << p
    regs: dict = defaultdict(lambda: [0] * m)
    for k, v in zip(keys, values):
        h = oracle_splitmix64(int(v) & _M64)
        r = h >> (64 - p)
        w = h & ((1 << (64 - p)) - 1)
        rho = (64 - p) - w.bit_length() + 1
        if rho > regs[k][r]:
            regs[k][r] = rho
    alpha = 0.7213 / (1.0 + 1.079 / m)
    big_r = 64 - p + 1
    out = {}
    for k, regvals in regs.items():
        s = sum(1 << (big_r - rj) for rj in regvals)
        raw = (alpha * m * m * float(2 ** big_r)) / float(s)
        zeros = sum(1 for rj in regvals if rj == 0)
        if raw <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)
        else:
            est = raw
        out[k] = int(math.floor(est + 0.5))
    return out


# -- k-means ---------------------------------------------------------------
# Frozen definition (mirrors rayxt.ann.kmeans): init = vectors of the k
# smallest ids; full squared-L2 float64 distances, argmin ties -> lowest
# cluster; centroids rounded to ndigits after every update (so partial-
# sum merge-order ulps cannot feed back); empty clusters keep their
# previous centroid.


def oracle_kmeans(ids, vecs, *, k: int = 8, iters: int = 5,
                  ndigits: int = 9):
    order = np.argsort(np.asarray(ids), kind="stable")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    cents = np.round(m[order[:k]], ndigits)

    def assign(mat, c):
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(iters):
        lab = assign(m, cents)
        new = cents.copy()
        for c in range(k):
            sel = m[lab == c]
            if len(sel):
                new[c] = sel.sum(axis=0) / len(sel)
        cents = np.round(new, ndigits)
    final = assign(m, cents)
    return {int(i): int(c) for i, c in zip(ids, final)}


def oracle_pca(ids, vecs, *, k: int = 4, ndigits: int = 6):
    """Naive PCA restatement: ONE full-matrix pass (no partials), same
    frozen spec as rayxt.ann.pca_project — population covariance
    rounded to ndigits before eigh, descending components, largest-|w|
    entry positive, projections rounded."""
    m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    k = min(k, m.shape[1])  # at most dim components exist
    n = len(m)
    mean = m.sum(axis=0) / n
    # the frozen spec's uncentered-moment form: E[xx^T] - mu mu^T
    cov = np.round(m.T @ m / n - np.outer(mean, mean), ndigits)
    _eigvals, eigvecs = np.linalg.eigh(cov)
    comp = eigvecs[:, ::-1][:, :k]
    flip = np.sign(comp[np.abs(comp).argmax(axis=0), np.arange(k)])
    comp = comp * np.where(flip == 0, 1.0, flip)[None, :]
    proj = np.round((m - mean[None, :]) @ comp, ndigits)
    return {int(i): proj[r].tolist() for r, i in enumerate(ids)}


def oracle_window_hashes(text: str, n: int) -> list:
    """Python-int restatement of the frozen window-hash spec
    (rayxt.dedup._window_hashes): per-token sha1-int64, Horner window
    hash mod 2^64 with base 1099511628211, >> 1."""
    B = 1099511628211
    MASK = (1 << 64) - 1
    toks = text.split()
    if not toks:
        return []
    th = [sha1_int64(t) for t in toks]
    m = min(n, len(toks))
    out = []
    for i in range(len(toks) - m + 1):
        h = 0
        for k in range(m):
            h = (h * B + th[i + k]) & MASK
        out.append(h >> 1)
    return out


def oracle_dup_ngram_stats(keys, texts, *, n: int = 20):
    """Duplicated n-gram span spec (rayxt.dedup.dup_ngram_stats): dup =
    corpus window count >= 2 (within-doc repeats included); docs with
    zero windows are absent.
    Returns {key: (n_windows, n_dup_windows, dup_fraction)}."""
    from collections import Counter

    per_doc = [oracle_window_hashes(t or "", n) for t in texts]
    counts = Counter(h for ws in per_doc for h in ws)
    out = {}
    for key, ws in zip(keys, per_doc):
        if not ws:
            continue
        nd = sum(1 for h in ws if counts[h] >= 2)
        out[key] = (len(ws), nd, round(nd / len(ws), 6))
    return out


def oracle_bpe_train(texts, *, n_merges: int = 20):
    """Naive BPE restatement: full-scan Counter over raw texts (no
    distributed partials), same frozen merge loop as rayxt.bpe —
    highest pair count, ties to the lexicographically smallest pair.
    Returns [(rank, left, right, count)]."""
    from collections import Counter

    freqs = Counter(w for t in texts for w in (t or "").split())
    words = {tuple(w): int(c) for w, c in freqs.items() if w}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for sym, c in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (left, right), count = min(pairs.items(),
                                   key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, left, right, count))
        joined = left + right
        new_words = {}
        for sym, c in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == left and sym[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + c
        words = new_words
    return merges


def oracle_bpe_token_counts(ids, texts, merges):
    """Greedy lowest-rank encode per word, summed per doc (no cache —
    the naive path)."""
    rank_of = {(left, right): rank for rank, left, right, _c in merges}

    def encode(word):
        sym = list(word)
        while len(sym) > 1:
            best_rank, best_i = None, -1
            for i in range(len(sym) - 1):
                r = rank_of.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_rank is None:
                break
            sym[best_i:best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return len(sym)

    return {int(i): sum(encode(w) for w in (t or "").split())
            for i, t in zip(ids, texts)}


def oracle_logreg(features, labels, *, iters: int = 20, lr: float = 1.0,
                  ndigits: int = 9):
    """Naive full-matrix logistic-regression GD restatement (same frozen
    spec as rayxt.stats.logreg_train: bias-first X', zero init,
    per-iteration round).  features = list of columns."""
    x = np.column_stack([np.ones(len(labels))]
                        + [np.asarray(c, dtype=np.float64) for c in features])
    y = np.asarray(labels, dtype=np.float64)
    w = np.zeros(x.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        g = x.T @ (p - y)
        w = np.round(w - lr * g / len(y), ndigits)
    return w.tolist()


def oracle_logreg_scores(features, weights, *, ndigits: int = 6):
    x = np.column_stack([np.ones(len(features[0]))]
                        + [np.asarray(c, dtype=np.float64) for c in features])
    w = np.asarray(weights, dtype=np.float64)
    return np.round(1.0 / (1.0 + np.exp(-(x @ w))), ndigits).tolist()


def oracle_decontaminate(ids, texts, eval_texts, *, n: int = 13):
    """Naive decontamination restatement: eval window-hash SET (python
    ints), per-doc membership count.  Returns
    {id: (n_overlap_windows, contaminated)}."""
    eval_set = set()
    for t in eval_texts:
        eval_set.update(oracle_window_hashes(t or "", n))
    out = {}
    for i, t in zip(ids, texts):
        wh = oracle_window_hashes(t or "", n)
        hits = sum(1 for h in wh if h in eval_set)
        out[int(i)] = (hits, hits > 0)
    return out


# -- Bloom filter restatement ------------------------------------------------
# The two 64-bit hash channels are a SHARED library primitive
# (pandas siphash64 with the frozen keys from rayxt.state — same
# discipline as the shared IDCT basis in the JPEG oracle); everything
# downstream (odd-step double hashing, bit set, membership AND) is
# restated here with plain Python ints and a set of positions.

_BLOOM_MIX = 0x9E3779B97F4A7C15


def _bloom_channels(value):
    import pandas as pd

    if isinstance(value, (int, np.integer)):
        a = np.asarray([value], dtype=np.int64)
        h1 = int(pd.util.hash_array(a)[0])
        h2 = int(pd.util.hash_array(
            np.asarray([h1], dtype=np.uint64) ^ np.uint64(_BLOOM_MIX))[0])
    else:
        a = np.asarray([value], dtype=object)
        h1 = int(pd.util.hash_array(a, hash_key="0123456789123456",
                                    categorize=False)[0])
        h2 = int(pd.util.hash_array(a, hash_key="rayxt.state.hk-b",
                                    categorize=False)[0])
    return h1, h2 | 1


def _bloom_value_positions(value, n_bits: int, n_hashes: int) -> list:
    h1, h2 = _bloom_channels(value)
    return [((h1 + i * h2) % (1 << 64)) % n_bits for i in range(n_hashes)]


def oracle_bloom_bits(keys, n_bits: int, n_hashes: int) -> set:
    bits: set[int] = set()
    for k in keys:
        bits.update(_bloom_value_positions(k, n_bits, n_hashes))
    return bits


def oracle_bloom_hits(build_keys, probe_keys, *, n_bits: int,
                      n_hashes: int) -> list:
    """-> [(probe_key, hit)] in probe order — INCLUDING which
    non-members false-positive (determinism of the frozen spec)."""
    bits = oracle_bloom_bits(build_keys, n_bits, n_hashes)
    out = []
    for k in probe_keys:
        pos = _bloom_value_positions(k, n_bits, n_hashes)
        out.append((k, all(p in bits for p in pos)))
    return out


# -- bigram LM perplexity restatement ---------------------------------------
# Plain dict counts, per-token loops, python floats — no numpy in the
# model path (log/exp are the shared libm primitives).


def _lm_tokens(text: str) -> list:
    import re as _re

    return _re.findall(r"[a-z0-9]+", (text or "").lower())


def oracle_lm_train(texts, *, vocab_size: int = 1000, alpha: float = 0.1):
    uni: dict = {}
    for t in texts:
        for w in _lm_tokens(t):
            uni[w] = uni.get(w, 0) + 1
    top = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    vocab = sorted(w for w, _ in top)
    index = {w: i for i, w in enumerate(vocab)}
    V = len(vocab)
    bi: dict = {}
    left = defaultdict(int)
    for t in texts:
        ids = [index.get(w, V) for w in _lm_tokens(t)]
        for a, b in zip(ids, ids[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
            left[a] += 1
    return {"vocab": vocab, "bi": bi, "left": dict(left),
            "alpha": alpha}


def oracle_lm_ppl(model, text: str, *, ndigits: int = 6) -> float:
    import math

    vocab = model["vocab"]
    V = len(vocab)
    index = {w: i for i, w in enumerate(vocab)}
    alpha = model["alpha"]
    ids = [index.get(w, V) for w in _lm_tokens(text)]
    if len(ids) < 2:
        return -1.0
    logs = []
    for a, b in zip(ids, ids[1:]):
        c12 = model["bi"].get((a, b), 0)
        c1 = model["left"].get(a, 0)
        logs.append(math.log((c12 + alpha) / (c1 + alpha * (V + 1))))
    return round(math.exp(-sum(logs) / len(logs)), ndigits)


# -- sequence-packing restatement -------------------------------------------


def oracle_pack_documents(ids, texts, *, max_tokens: int,
                          n_buckets: int = 64):
    """-> {id: (n_tokens, pack_id, pack_pos, oversize)} — plain loops,
    same frozen spec as rayxt.text.pack_documents (the bucket hash is
    the shared pandas-siphash digest primitive, evaluated per value)."""
    import pandas as pd

    per_bucket = defaultdict(list)
    for i, t in zip(ids, texts):
        n = len((t or "").split(" "))
        if isinstance(i, (int, np.integer)):
            h = int(pd.util.hash_array(
                np.asarray([i], dtype=np.int64))[0])
        else:
            h = int(pd.util.hash_array(
                np.asarray([i], dtype=object),
                hash_key="0123456789123456", categorize=False)[0])
        per_bucket[h % n_buckets].append((i, n))
    out = {}
    for b, rows in per_bucket.items():
        rows.sort()
        seq = 0
        acc = 0
        pos = 0
        for i, n in rows:
            if pos > 0 and acc + n > max_tokens:
                seq += 1
                acc = 0
                pos = 0
            out[i] = (n, seq + (b << 40), pos, n > max_tokens)
            acc += n
            pos += 1
            if acc >= max_tokens:
                seq += 1
                acc = 0
                pos = 0
    return out


def oracle_remove_dup_substrings(keys, texts, *, n: int = 20,
                                 min_count: int = 2):
    """ExactSubstr span-removal spec (rayxt.dedup.remove_dup_substrings):
    every token covered by an n-token window occurring >= min_count
    times corpus-wide (within-doc repeats included) is deleted; output
    text is the space-join of the survivors.  Pure-Python mechanism:
    dict counting + per-position boolean list, no numpy.
    Returns {key: (n_tokens, n_removed, text_dedup)}."""
    from collections import Counter

    per_doc = [oracle_window_hashes(t or "", n) for t in texts]
    counts = Counter(h for ws in per_doc for h in ws)
    out = {}
    for key, txt, ws in zip(keys, texts, per_doc):
        toks = (txt or "").split()
        if not ws:
            out[key] = (0, 0, "")
            continue
        m = min(n, len(toks))
        covered = [False] * len(toks)
        for i, h in enumerate(ws):
            if counts[h] >= min_count:
                for j in range(i, i + m):
                    covered[j] = True
        kept = " ".join(t for t, c in zip(toks, covered) if not c)
        out[key] = (len(toks), sum(covered), kept)
    return out


def oracle_semdedup(ids, vecs, *, k: int = 8, iters: int = 5,
                    threshold: float = 0.9, ndigits: int = 9,
                    sim_digits: int = 6):
    """SemDeDup spec (rayxt.ann.semdedup): clusters per the frozen
    kmeans contract; centroid_sim = rounded cosine to own centroid;
    visit order (centroid_sim asc, id asc); greedy keep iff every
    ROUNDED pairwise cosine against the kept-so-far set is < threshold.
    Per-pair np.dot in a Python loop (no matmul) — the sim_digits
    rounding absorbs summation-order ulps on both sides.
    Returns {id: (cluster, centroid_sim, kept)}."""
    ids = list(ids)
    order0 = np.argsort(np.asarray(ids), kind="stable")
    m = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
    cents = np.round(m[order0[:k]], ndigits)

    def assign(mat, c):
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return d.argmin(axis=1)

    for _ in range(iters):
        lab = assign(m, cents)
        new = cents.copy()
        for c in range(k):
            sel = m[lab == c]
            if len(sel):
                new[c] = sel.sum(axis=0) / len(sel)
        cents = np.round(new, ndigits)
    lab = assign(m, cents)

    def norm(v):
        n = np.linalg.norm(v)
        return v / n if n > 0 else v * 0.0

    mn = np.stack([norm(v) for v in m])
    cn = np.stack([norm(c) for c in cents])
    csim = [round(float(np.dot(mn[i], cn[lab[i]])), sim_digits)
            for i in range(len(ids))]

    out = {}
    for c in sorted(set(int(x) for x in lab)):
        members = [i for i in range(len(ids)) if lab[i] == c]
        members.sort(key=lambda i: (csim[i], ids[i]))
        kept_rows: list[int] = []
        for i in members:
            dup = any(round(float(np.dot(mn[i], mn[j])), sim_digits)
                      >= threshold for j in kept_rows)
            if not dup:
                kept_rows.append(i)
            out[int(ids[i])] = (c, csim[i], not dup)
    return out


def oracle_dsir(ids, texts, target_texts, *, buckets: int = 10_000,
                smoothing: float = 0.01, seed: int = 1,
                ndigits: int = 6):
    """DSIR spec (rayxt.dsir): hashed unigram+bigram buckets, smoothed
    bucket log-ratio target-vs-raw, per-doc score = sequential Python
    float sum over grams (rounded), gumbel key from
    splitmix64(id + seed * golden64).
    Returns {id: (n_grams, dsir_logw, gumbel_key)}."""
    import math

    def gram_ids(text):
        toks = (text or "").lower().split()
        grams = toks + [a + " " + b for a, b in zip(toks, toks[1:])]
        return [sha1_int64(g) % buckets for g in grams]

    def counts(txts):
        c = [0] * buckets
        for t in txts:
            for b in gram_ids(t):
                c[b] += 1
        return c

    t_cnt = counts(target_texts)
    r_cnt = counts(texts)
    t_tot, r_tot = sum(t_cnt), sum(r_cnt)
    lr = [math.log((t_cnt[b] + smoothing) / (t_tot + smoothing * buckets))
          - math.log((r_cnt[b] + smoothing) / (r_tot + smoothing * buckets))
          for b in range(buckets)]

    golden = 0x9E3779B97F4A7C15
    out = {}
    for i, txt in zip(ids, texts):
        gs = gram_ids(txt)
        s = 0.0
        for b in gs:
            s += lr[b]
        logw = round(s, ndigits) if gs else 0.0
        z = oracle_splitmix64((int(i) + seed * golden) & _M64)
        u = max((z >> 11) * 2.0**-53, 2.0**-53)
        g = -math.log(-math.log(u))
        out[int(i)] = (len(gs), logw, round(logw + g, ndigits))
    return out
