"""FSST-style string compression (Boncz, Neumann, Leis — VLDB'20).

A 255-entry table of 1..8-byte symbols replaces substrings with 1-byte
codes; code 255 escapes a literal byte. Table training is a simplified
bottom-up generation scheme from the paper: iteratively compress a
sample with the current table, count adjacent symbol concatenations,
keep the 255 highest-gain (frequency x length) candidates.

This codec exists in the suite per the north rule; it is the *ratio*
option for high-cardinality text (url, text). Encoding uses a
longest-first regex alternation (greedy longest match per position —
equivalent compression model, one C-level matcher pass per string);
decoding is fully vectorized (table row gather + run-parity escape
resolution, no per-byte Python).

The chunk payload is self-contained: the trained table ships in the
header, so any chunk decodes independently — the property that makes
chunk-granular resume safe.

Format: <u8 n_syms> (<u8 len><bytes sym>)* <u32 n_strings>
        <lens blob: FOR-bitpacked code-lengths per string> <code bytes>
"""

from __future__ import annotations

import re
import struct
from collections import Counter

import numpy as np

from .light import for_bitpack_decode, for_bitpack_encode

ESCAPE = 255
MAX_SYMBOLS = 255
MAX_SYM_LEN = 8
_GENERATIONS = 3
_SAMPLE_BYTES = 1 << 16


_END = object()


def _trie_regex(symbols: list[bytes]) -> bytes:
    """Compile the symbol set into a prefix-trie regex.

    A flat 255-way alternation makes Python's matcher try every
    alternative at every position (O(symbols) per byte); the trie
    collapses shared prefixes and the greedy optional suffixes keep
    longest-match semantics (measured ~5x faster matching).
    """
    trie: dict = {}
    for s in symbols:
        node = trie
        for ch in s:
            node = node.setdefault(ch, {})
        node[_END] = True

    def emit(node: dict) -> bytes:
        end = _END in node
        singles: list[bytes] = []
        branches: list[bytes] = []
        for ch in sorted(k for k in node if k is not _END):
            esc = re.escape(bytes((ch,)))
            sub = emit(node[ch])
            if sub == b"":
                singles.append(esc)
            else:
                branches.append(esc + sub)
        if singles:
            branches.append(
                b"[" + b"".join(singles) + b"]" if len(singles) > 1 else singles[0]
            )
        if not branches:
            return b""
        if len(branches) == 1 and not end:
            return branches[0]
        pat = b"(?:" + b"|".join(branches) + b")"
        if end:
            pat += b"?"  # greedy: longer symbol wins, falls back to this end
        return pat

    return emit(trie)


def _compile(symbols: list[bytes]) -> tuple[re.Pattern, dict[bytes, int]]:
    if symbols:
        pattern = re.compile(_trie_regex(symbols) + b"|(?s:.)")
    else:
        pattern = re.compile(b"(?s:.)")
    code_of = {s: i for i, s in enumerate(symbols)}
    return pattern, code_of


def _pack_le(s: bytes) -> int:
    """Little-endian padded u64 of a <=8-byte symbol: byte 0 in the
    low bits, zero padding above — with the length kept alongside,
    (word, len) is a bijection onto the symbol bytes."""
    return int.from_bytes(s.ljust(8, b"\0"), "little")


def _rank_symbols(words: np.ndarray, lens: np.ndarray, cnts: np.ndarray) -> list[bytes]:
    """Vectorized twin of

        ranked = sorted(counts.items(), key=lambda kv: (-cnt*len, bytes))
        [sym for sym, cnt in ranked[:MAX_SYMBOLS] if cnt > 1]

    over (word, len)-packed candidates. Duplicate byte strings (two
    different token concatenations yielding the same bytes) merge
    their counts exactly like the Counter did; bytes-lexicographic tie
    order equals (big-endian padded word, len) ascending — a zero pad
    byte sorts before any longer continuation, and symbols differing
    only by trailing NUL bytes differ in len. Pinned equal to the
    Counter reference by tests/test_corpus_ops.py."""
    if words.size == 0:
        return []
    # group identical (word, len) keys: integer lexsort + run detection
    # beats np.unique on a structured dtype (memcmp comparisons) ~3x
    order0 = np.lexsort((lens, words))
    ws = words[order0]
    ls = lens[order0].astype(np.int64)
    new_grp = np.empty(ws.size, dtype=bool)
    new_grp[0] = True
    new_grp[1:] = (ws[1:] != ws[:-1]) | (ls[1:] != ls[:-1])
    grp = np.cumsum(new_grp) - 1
    m_cnts = np.bincount(grp, weights=cnts[order0].astype(np.float64)).astype(np.int64)
    u_w = ws[new_grp]
    u_l = ls[new_grp]
    gains = m_cnts * u_l
    be = u_w.byteswap()
    order = np.lexsort((u_l, be, -gains))[:MAX_SYMBOLS]
    return [
        int(u_w[i]).to_bytes(8, "little")[: u_l[i]]
        for i in order
        if m_cnts[i] > 1
    ]


def _count_tokens_pairs_native(
    offsets: np.ndarray, data: np.ndarray, symbols: list[bytes]
) -> Counter | None:
    """Token + adjacent-pair frequency counting via the C compressor
    and vectorized escape-parity parsing (the training hot loop)."""
    from .. import _native

    nat = _native.get()
    if nat is None:
        return None
    lens, code_bytes = compress_strings(offsets, data, symbols)
    codes = np.frombuffer(code_bytes, dtype=np.uint8)
    m = codes.size
    if m == 0:
        z = np.zeros(0, dtype=np.int64)
        return z.astype(np.uint64), z, z
    string_id = np.repeat(np.arange(lens.size, dtype=np.int64), lens)

    # token starts: every position except literal payloads. Escape
    # resolution = run parity over maximal 0xFF runs (see decode()).
    is_ff = codes == ESCAPE
    if is_ff.any():
        run_start = np.empty(m, dtype=bool)
        run_start[0] = is_ff[0]
        np.greater(is_ff[1:], is_ff[:-1], out=run_start[1:])
        first_in_run = np.zeros(m, dtype=np.int64)
        starts_idx = np.flatnonzero(run_start)
        first_in_run[starts_idx] = starts_idx
        np.maximum.accumulate(first_in_run, out=first_in_run)
        is_escape = is_ff & ((np.arange(m) - first_in_run) % 2 == 0)
        after_escape = np.zeros(m, dtype=bool)
        after_escape[1:] = is_escape[:-1]
        is_token_start = ~after_escape
        # string boundaries reset parity per string by construction:
        # compress_strings never splits an escape across strings
        tok_pos = np.flatnonzero(is_token_start)
        tok_id = codes[tok_pos].astype(np.int64)
        esc_at = is_escape[tok_pos]
        lit_pos = np.minimum(tok_pos + 1, m - 1)
        tok_id = np.where(esc_at, 256 + codes[lit_pos].astype(np.int64), tok_id)
    else:
        tok_pos = np.arange(m, dtype=np.int64)
        tok_id = codes.astype(np.int64)
    tok_str = string_id[tok_pos]

    # token id -> (LE-packed word, len): ids < 256 are table symbols,
    # 256 + b is the escaped literal byte b
    tok_w = np.zeros(512, dtype=np.uint64)
    tok_l = np.zeros(512, dtype=np.int64)
    for i, s in enumerate(symbols):
        tok_w[i] = _pack_le(s)
        tok_l[i] = len(s)
    tok_w[256:] = np.arange(256, dtype=np.uint64)
    tok_l[256:] = 1

    singles = np.bincount(tok_id, minlength=512)
    s_ids = np.flatnonzero(singles)
    words = [tok_w[s_ids]]
    lens = [tok_l[s_ids]]
    cnts = [singles[s_ids].astype(np.int64)]
    if tok_id.size > 1:
        same = tok_str[1:] == tok_str[:-1]
        combined = tok_id[:-1][same] * 512 + tok_id[1:][same]
        pc = np.bincount(combined, minlength=1)
        p_keys = np.flatnonzero(pc)
        pa = p_keys // 512
        pb = p_keys % 512
        plen = tok_l[pa] + tok_l[pb]
        keep = plen <= MAX_SYM_LEN
        pa, pb, plen = pa[keep], pb[keep], plen[keep]
        # concatenated bytes as one packed word: second token shifted
        # past the first (len_a <= 7 after the keep filter)
        pw = tok_w[pa] | (tok_w[pb] << (tok_l[pa] * 8).astype(np.uint64))
        words.append(pw)
        lens.append(plen)
        cnts.append(pc[p_keys][keep].astype(np.int64))
    return np.concatenate(words), np.concatenate(lens), np.concatenate(cnts)


def train(sample: list[bytes]) -> list[bytes]:
    """Train a symbol table on sample strings (deterministic)."""
    budget = _SAMPLE_BYTES
    pruned: list[bytes] = []
    for s in sample:
        if budget <= 0:
            break
        pruned.append(s[: min(len(s), 4096)])
        budget -= len(pruned[-1])
    if not pruned:
        return []

    data = np.frombuffer(b"".join(pruned), dtype=np.uint8)
    offsets = np.zeros(len(pruned) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in pruned], out=offsets[1:])

    symbols: list[bytes] = []
    for gen in range(_GENERATIONS):
        if gen == 0:
            # generation 0 (empty table): every token is a raw byte, so
            # token/pair counting is two bincounts — no compressor pass
            singles = np.bincount(data, minlength=256)
            s_ids = np.flatnonzero(singles)
            words = [s_ids.astype(np.uint64)]
            lens = [np.ones(s_ids.size, dtype=np.int64)]
            cnts = [singles[s_ids].astype(np.int64)]
            if data.size > 1:
                pair_ids = data[:-1].astype(np.int32) * 256 + data[1:]
                # drop pairs straddling string boundaries
                boundary = np.zeros(data.size - 1, dtype=bool)
                inner_ends = offsets[1:-1] - 1
                boundary[inner_ends[(inner_ends >= 0) & (inner_ends < data.size - 1)]] = True
                pc = np.bincount(pair_ids[~boundary], minlength=65536)
                p_keys = np.flatnonzero(pc)
                # LE packing: first byte (key >> 8) in the low bits
                words.append(
                    (p_keys >> 8).astype(np.uint64)
                    | ((p_keys & 255).astype(np.uint64) << np.uint64(8))
                )
                lens.append(np.full(p_keys.size, 2, dtype=np.int64))
                cnts.append(pc[p_keys].astype(np.int64))
            symbols = _rank_symbols(
                np.concatenate(words), np.concatenate(lens), np.concatenate(cnts)
            )
            continue
        counted = _count_tokens_pairs_native(offsets, data, symbols)
        if counted is None:  # pure-Python fallback (no C toolchain)
            pattern, _code_of = _compile(symbols)
            counts: Counter[bytes] = Counter()
            for s in pruned:
                toks = pattern.findall(s)
                counts.update(toks)
                for a, b in zip(toks, toks[1:]):
                    cat = a + b
                    if len(cat) <= MAX_SYM_LEN:
                        counts[cat] += 1
            ranked = sorted(
                counts.items(), key=lambda kv: (-kv[1] * len(kv[0]), kv[0])
            )
            symbols = [sym for sym, cnt in ranked[:MAX_SYMBOLS] if cnt > 1]
        else:
            symbols = _rank_symbols(*counted)
    return symbols


_PREP_MEMO: dict[int, tuple] = {}  # id(symbols) -> (ref, mat, lens32)


def _prepared(symbols: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """Memoized (padded symbol matrix, lengths) for the C compressor —
    rebuilt once per trained table instead of once per call."""
    hit = _PREP_MEMO.get(id(symbols))
    if hit is not None and hit[0] is symbols:
        return hit[1], hit[2]
    syms_mat = np.zeros((max(len(symbols), 1), 8), dtype=np.uint8)
    lens32 = np.zeros(max(len(symbols), 1), dtype=np.int32)
    for i, sym in enumerate(symbols):
        syms_mat[i, : len(sym)] = np.frombuffer(sym, dtype=np.uint8)
        lens32[i] = len(sym)
    flat = syms_mat.ravel()
    if len(_PREP_MEMO) >= 64:
        _PREP_MEMO.clear()
    _PREP_MEMO[id(symbols)] = (symbols, flat, lens32)
    return flat, lens32


def compress_strings(
    offsets: np.ndarray, data: np.ndarray, symbols: list[bytes]
) -> tuple[np.ndarray, bytes]:
    """Compress each string independently (no cross-boundary symbols).
    Returns (code lengths per string, concatenated code bytes)."""
    from .. import _native

    nat = _native.get()
    if nat is not None and symbols:
        n_str = offsets.size - 1
        syms_flat, lens32 = _prepared(symbols)
        data_c = np.ascontiguousarray(data, dtype=np.uint8)
        offs_c = np.ascontiguousarray(offsets, dtype=np.int64)
        out = np.empty(2 * max(int(data.size), 1), dtype=np.uint8)
        out_lens = np.empty(max(n_str, 1), dtype=np.int64)
        total = nat["fsst_compress_block2"](
            data_c, offs_c, n_str, syms_flat, lens32, len(symbols), out, out_lens
        )
        return out_lens[:n_str], out[:total].tobytes()

    pattern, code_of = _compile(symbols)
    raw = data.tobytes()
    off = offsets.tolist()
    chunks: list[bytes] = []
    lens = np.empty(len(off) - 1, dtype=np.int64)

    # findall yields only table symbols or single bytes, so a complete
    # token->bytes map exists up front; this is ~3x faster than a
    # per-match substitution callback.
    tok2code: dict[bytes, bytes] = {s: bytes((c,)) for s, c in code_of.items()}
    for bb in range(256):
        tok2code.setdefault(bytes((bb,)), bytes((ESCAPE, bb)))

    lookup = tok2code.__getitem__
    for i in range(len(off) - 1):
        enc = b"".join(map(lookup, pattern.findall(raw[off[i] : off[i + 1]])))
        chunks.append(enc)
        lens[i] = len(enc)
    return lens, b"".join(chunks)


def encode(offsets: np.ndarray, data: np.ndarray, symbols: list[bytes] | None = None) -> bytes:
    offsets = offsets.astype(np.int64, copy=False)
    n = offsets.size - 1
    if symbols is None:
        # train on an evenly-spaced sample of strings; slice only the
        # sampled bytes — a whole-buffer tobytes() copied the full
        # multi-MB chunk just to read <=64 KB of training sample
        step = max(1, n // 256)
        sample = [
            data[int(offsets[i]) : int(offsets[i + 1])].tobytes()
            for i in range(0, n, step)
        ]
        symbols = train(sample)
    lens, codes = compress_strings(offsets, data, symbols)
    head = [struct.pack("<B", len(symbols))]
    for s in symbols:
        head.append(struct.pack("<B", len(s)))
        head.append(s)
    lens_blob = for_bitpack_encode(lens) if n else b""
    head.append(struct.pack("<II", n, len(lens_blob)))
    head.append(lens_blob)
    return b"".join(head) + codes


def table_of(buf: memoryview) -> list[bytes]:
    """Read the symbol table back out of an encoded payload header."""
    buf = memoryview(buf)
    if buf.format != "B":
        buf = buf.cast("B")  # signed-char views desync byte indexing
    n_syms = buf[0]
    pos = 1
    out = []
    for _ in range(n_syms):
        ln = buf[pos]
        pos += 1
        out.append(bytes(buf[pos : pos + ln]))
        pos += ln
    return out


def decode(buf: memoryview, n_unused: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode -> (offsets, data) string block."""
    buf = memoryview(buf)
    if buf.format != "B":
        buf = buf.cast("B")  # signed-char views desync byte indexing
    n_syms = buf[0]
    pos = 1
    table = np.zeros((256, MAX_SYM_LEN), dtype=np.uint8)
    sym_len = np.zeros(256, dtype=np.int64)
    for c in range(n_syms):
        ln = buf[pos]
        pos += 1
        table[c, :ln] = np.frombuffer(buf[pos : pos + ln], dtype=np.uint8)
        sym_len[c] = ln
        pos += ln
    n, lens_sz = struct.unpack_from("<II", buf, pos)
    pos += 8
    code_lens = (
        for_bitpack_decode(buf[pos : pos + lens_sz], n, np.int64)
        if n
        else np.zeros(0, dtype=np.int64)
    )
    pos += lens_sz
    codes = np.frombuffer(buf[pos:], dtype=np.uint8)
    m = codes.size

    from .. import _native

    nat = _native.get()
    if nat is not None and n:
        # C fast path: one sizing walk + one 8-byte-store copy walk
        # (the decode hot loop — the numpy escape-parity path below
        # stays as the reference/fallback implementation)
        code_off = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(code_lens, out=code_off[1:])
        sym_len32 = sym_len.astype(np.int32)
        codes_c = np.ascontiguousarray(codes)
        total = int(nat["fsst_decoded_size"](codes_c, m, sym_len32)) if m else 0
        if total >= 0:  # -1 = truncated escape detected by the sizing
            # walk — fall straight to the numpy reference path (a -1
            # from BOTH passes must not compare as success)
            out = np.empty(total + 8, dtype=np.uint8)
            byte_ends = np.zeros(n + 1, dtype=np.int64)
            got = nat["fsst_decode_block"](
                codes_c, code_off, n, np.ascontiguousarray(table.ravel()),
                sym_len32, out, total + 8, byte_ends[1:],
            )
            if got == total:
                return byte_ends, out[:total]
        # inconsistent sizing (corrupt payload): numpy reference decides

    # resolve escapes: within each maximal run of 0xFF bytes, even
    # offsets are escape markers, odd offsets are literal payloads;
    # any byte directly after an escape is a literal.
    is_ff = codes == ESCAPE
    m = codes.size
    out_len = sym_len[codes].copy()
    if is_ff.any():
        run_start = np.empty(m, dtype=bool)
        run_start[0] = is_ff[0]
        np.greater(is_ff[1:], is_ff[:-1], out=run_start[1:])
        run_id = np.cumsum(run_start)
        first_in_run = np.zeros(m, dtype=np.int64)
        starts_idx = np.flatnonzero(run_start)
        first_in_run[starts_idx] = starts_idx
        np.maximum.accumulate(first_in_run, out=first_in_run)
        offset_in_run = np.arange(m, dtype=np.int64) - first_in_run
        is_escape = is_ff & (offset_in_run % 2 == 0)
        is_literal_ff = is_ff & ~is_escape
        # literal byte after an escape (the non-FF case)
        after_escape = np.zeros(m, dtype=bool)
        after_escape[1:] = is_escape[:-1]
        is_literal = is_literal_ff | (after_escape & ~is_ff)
        out_len[is_escape] = 0
        out_len[is_literal] = 1
        mat = table[codes]
        lit_idx = np.flatnonzero(is_literal)
        mat[lit_idx, 0] = codes[lit_idx]
    else:
        mat = table[codes]

    # per-code byte gather
    ends = np.cumsum(out_len)
    total = int(ends[-1]) if m else 0
    row = np.repeat(np.arange(m, dtype=np.int64), out_len)
    col = np.arange(total, dtype=np.int64) - np.repeat(ends - out_len, out_len)
    data = mat[row, col]

    # map per-string code-lengths to per-string byte-lengths
    code_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(code_lens, out=code_off[1:])
    byte_ends = np.zeros(n + 1, dtype=np.int64)
    byte_ends[1:] = ends[np.maximum(code_off[1:], 1) - 1] if m else 0
    byte_ends[code_off == 0] = 0
    # strings with zero codes decode to the running position
    np.maximum.accumulate(byte_ends, out=byte_ends)
    return byte_ends, data
