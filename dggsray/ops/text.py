"""Text-analysis operators: language id, quality scoring, token counting,
document fingerprinting — per-batch vectorized stages of the training-data
pipeline."""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Stopword profiles (top function words, public knowledge) for the heuristic
# language identifier.  Scores are stopword hit-rates per language.
_STOPWORDS = {
    "en": {"the", "of", "and", "to", "in", "is", "it", "that", "was", "for",
           "on", "are", "with", "as", "be", "at", "by", "this", "have", "from"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "se",
           "del", "por", "con", "para", "es", "al", "lo", "como", "más"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "sich",
           "des", "auf", "für", "ist", "im", "dem", "nicht", "ein", "eine", "als"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du", "que",
           "est", "dans", "qui", "pour", "pas", "sur", "au", "plus", "par"},
    "it": {"il", "di", "che", "la", "e", "in", "un", "una", "per", "è", "con",
           "non", "si", "le", "del", "i", "al", "dei", "come", "più"},
}


def detect_language(text: str) -> tuple[str, float]:
    """(lang, confidence): stopword hit-rate argmax; 'und' (undetermined) when no
    profile scores above zero."""
    toks = text.lower().split()
    if not toks:
        return "und", 0.0
    best, score = "und", 0.0
    for lang, sw in _STOPWORDS.items():
        s = sum(1 for t in toks if t in sw) / len(toks)
        if s > score:
            best, score = lang, s
    return best, score


def with_language(ds, text_col: str = "text"):
    """Vectorized detect_language over a batch: one Arrow lowercase+split, then
    per-language `is_in` membership over the flattened token array with
    segment-sums via reduceat — no per-row Python.  Semantics identical to
    detect_language (whitespace split, hit-rate argmax, first-language ties,
    'und' at score 0)."""
    langs = list(_STOPWORDS)
    value_sets = [pa.array(sorted(_STOPWORDS[l])) for l in langs]

    def kernel(b: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(pc.utf8_lower(b.column(text_col)), r"\s+")
        toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        flat = toks.flatten()
        off = toks.offsets.to_numpy()
        off = off - off[0]          # sliced ListArrays carry a base offset
        starts, ends = off[:-1], off[1:]
        nz = ends > starts

        def segsum(vals: np.ndarray) -> np.ndarray:
            out = np.zeros(len(starts), dtype=np.int64)
            if nz.any():
                out[nz] = np.add.reduceat(vals, starts[nz])
            return out

        # token count per doc, excluding the "" artifacts of regex split
        # (python's .split() drops empties; split_pattern_regex keeps them)
        nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False) \
                     .astype(np.int64)
        n_tok = segsum(nonempty)
        hits = np.zeros((len(langs), len(starts)), dtype=np.int64)
        for i, vs in enumerate(value_sets):
            hit = pc.is_in(flat, value_set=vs) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
            hits[i] = segsum(hit)
        # argmax on hits == argmax on hits/n (same denominator per row);
        # first max wins = dict-order tie-break, matching detect_language
        best_i = hits.argmax(axis=0)
        best_hits = hits[best_i, np.arange(len(starts))]
        und = best_hits <= 0
        lang_arr = np.array(langs, dtype=object)[best_i]
        lang_arr[und] = "und"
        n_safe = np.maximum(n_tok, 1).astype(np.float64)
        conf = np.where(und, 0.0, best_hits / n_safe)
        return b.append_column("detected_lang", pa.array(lang_arr, pa.string())) \
                .append_column("lang_confidence", pa.array(conf, pa.float64())) \
                .append_column("lang_hits", pa.array(np.where(und, 0, best_hits),
                                                     type=pa.int64())) \
                .append_column("n_tokens_lang", pa.array(n_tok, pa.int64()))
    return ds.map_batches(kernel, batch_format="pyarrow")


def quality_metrics_batch(b: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-doc quality signals, all integers (oracle-exact): token count, char
    count, punctuation/digit/upper counts, max token length."""
    txt = b.column(text_col)
    toks = pc.split_pattern_regex(txt, r"\s+")
    n_tokens = pc.cast(pc.list_value_length(toks), pa.int64())
    n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
    # char-class counts as Arrow RE2 kernels (char-based like the SQL oracle's
    # regexp_replace length delta) — no per-row Python
    punct = pc.cast(pc.count_substring_regex(txt, r"[,.;:!?'\"()\-]"), pa.int64())
    digit = pc.cast(pc.count_substring_regex(txt, "[0-9]"), pa.int64())
    upper = pc.cast(pc.count_substring_regex(txt, "[A-Z]"), pa.int64())
    # max token length: utf8_length over the flattened token list, segment max
    # via reduceat on the list offsets (split of "" yields [""], so no segment
    # is ever empty, but guard anyway)
    toks_arr = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    tok_len = pc.utf8_length(toks_arr.flatten()).to_numpy()
    off = toks_arr.offsets.to_numpy()
    off = off - off[0]          # sliced ListArrays carry a nonzero base offset
    starts, ends = off[:-1], off[1:]
    max_tok = np.zeros(len(starts), dtype=np.int64)
    nz = ends > starts
    if nz.any():
        max_tok[nz] = np.maximum.reduceat(tok_len, starts[nz])
    return b.append_column("n_tokens", n_tokens) \
            .append_column("n_chars", n_chars) \
            .append_column("n_punct", punct) \
            .append_column("n_digits", digit) \
            .append_column("n_upper", upper) \
            .append_column("max_token_len", pa.array(max_tok))


def with_quality(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: quality_metrics_batch(b, text_col),
                          batch_format="pyarrow")


def quality_score_batch(b: pa.Table) -> pa.Table:
    """Composite quality score in [0,1] from the integer signals (heuristic:
    penalize very short docs, high punctuation/digit ratios, huge tokens)."""
    n_tok = b.column("n_tokens").to_numpy().astype(np.float64)
    n_ch = np.maximum(b.column("n_chars").to_numpy().astype(np.float64), 1)
    punct_r = b.column("n_punct").to_numpy() / n_ch
    digit_r = b.column("n_digits").to_numpy() / n_ch
    max_tok = b.column("max_token_len").to_numpy().astype(np.float64)
    score = (np.clip(n_tok / 20.0, 0, 1)
             * np.clip(1 - 4 * punct_r, 0, 1)
             * np.clip(1 - 4 * digit_r, 0, 1)
             * np.where(max_tok > 40, 0.5, 1.0))
    return b.append_column("quality_score", pa.array(score))


def repetition_metrics_batch(b: pa.Table, text_col: str = "text") -> pa.Table:
    """Token/bigram repetition signals (Gopher/C4-style quality rules), all
    integers and fully vectorized: one Arrow split, one dictionary encode,
    per-doc distinct counts via a single lexsort + boundary compare.

    Outputs per doc: n_tokens (whitespace tokens, empties dropped),
    n_distinct_tokens, n_bigrams (= max(n_tokens-1, 0)),
    n_distinct_bigrams.  A doc with heavy repetition has
    n_distinct_* << n_* — the downstream filter thresholds the ratios."""
    toks = pc.split_pattern_regex(b.column(text_col), r"\s+")
    toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = toks.flatten()
    off = toks.offsets.to_numpy()
    off = (off - off[0]).astype(np.int64)
    lens = off[1:] - off[:-1]
    nseg = len(lens)
    seg_all = np.repeat(np.arange(nseg, dtype=np.int64), lens)
    keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)

    codes = pc.dictionary_encode(flat).indices.to_numpy(
        zero_copy_only=False).astype(np.int64)
    seg = seg_all[keep]
    code = codes[keep]
    n_tok = np.bincount(seg, minlength=nseg).astype(np.int64)

    def distinct_per_seg(s: np.ndarray, k: np.ndarray) -> np.ndarray:
        if s.size == 0:
            return np.zeros(nseg, dtype=np.int64)
        order = np.lexsort((k, s))
        ss, kk = s[order], k[order]
        first = np.ones(ss.size, dtype=bool)
        first[1:] = (ss[1:] != ss[:-1]) | (kk[1:] != kk[:-1])
        return np.bincount(ss[first], minlength=nseg).astype(np.int64)

    n_dtok = distinct_per_seg(seg, code)

    # bigrams: consecutive filtered tokens within the same doc; the pair key
    # packs two dictionary codes into one int64 (dict size bounds the base)
    if seg.size >= 2:
        adj = seg[1:] == seg[:-1]
        base = np.int64(code.max() + 1) if code.size else np.int64(1)
        pair_seg = seg[:-1][adj]
        pair_key = code[:-1][adj] * base + code[1:][adj]
        n_dbig = distinct_per_seg(pair_seg, pair_key)
    else:
        n_dbig = np.zeros(nseg, dtype=np.int64)
    n_big = np.maximum(n_tok - 1, 0)

    return b.append_column("n_tokens", pa.array(n_tok)) \
            .append_column("n_distinct_tokens", pa.array(n_dtok)) \
            .append_column("n_bigrams", pa.array(n_big)) \
            .append_column("n_distinct_bigrams", pa.array(n_dbig))


def with_repetition(ds, text_col: str = "text"):
    return ds.map_batches(lambda b: repetition_metrics_batch(b, text_col),
                          batch_format="pyarrow")


def winnowing_fingerprint(text: bytes, k: int = 5, window: int = 4) -> np.ndarray:
    """Winnowing (Schleimer et al. 2003): k-gram rolling hashes, per-window
    minimum, deduplicated — a compact document fingerprint set."""
    from .dedup import _shingle_hashes, _perm_constants
    b = np.frombuffer(text, dtype=np.uint8)
    if b.size < k:
        return np.zeros(0, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    mult = (np.uint64(256) ** np.arange(k, dtype=np.uint64))
    with np.errstate(over="ignore"):
        h = (win @ mult) * np.uint64(0x9E3779B97F4A7C15)
    if h.size < window:
        return np.unique(h.min(keepdims=True))
    sw = np.lib.stride_tricks.sliding_window_view(h, window)
    return np.unique(sw.min(axis=1))


def with_fingerprints(ds, text_col: str = "text", k: int = 5, window: int = 4):
    def kernel(b: pa.Table) -> pa.Table:
        fps = [winnowing_fingerprint(t.encode("utf-8", "ignore"), k, window)
               for t in b.column(text_col).to_pylist()]
        return b.append_column(
            "fingerprint", pa.array([f.tolist() for f in fps],
                                    pa.list_(pa.uint64()))) \
                .append_column("fp_size", pa.array([f.size for f in fps],
                                                   pa.int64()))
    return ds.map_batches(kernel, batch_format="pyarrow")
