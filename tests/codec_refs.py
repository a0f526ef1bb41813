"""Vendored scalar codec references for the multimodal tests.

Round 13 (ADVICE r12 #2): the 'exhaustive' G.711 and IMA-ADPCM
cross-checks were gated on ``pytest.importorskip("audioop")``;
``audioop`` is removed in Python 3.13, so on newer interpreters the
headline verifications would silently skip while the docstrings and
COVERAGE.md claim all 65536 inputs are verified.  This module vendors
the published scalar algorithms — the CCITT G.711 companders (the
Sun/CCITT reference code the stdlib itself wraps) and the Intel/DVI
IMA-ADPCM step coder — as per-sample Python, no numpy, so the tests
keep an INDEPENDENT reference on every interpreter.  On interpreters
that still ship ``audioop``, ``test_codec_refs_match_audioop`` pins
this module against the stdlib exhaustively, so the vendored copy can
never drift silently while a second independent implementation is
available.

These are test-only references: deliberately scalar, loop-per-sample,
shaped by the public C pseudocode rather than by the package's
vectorized implementations (``operators/multimodal.py``), so a shared
bug is implausible.
"""

# --- G.711 (CCITT) -----------------------------------------------------
# Segment ends from the CCITT reference code (Sun Microsystems g711.c,
# public domain); audioop feeds 14-bit (u-law) / 13-bit (A-law)
# magnitudes, i.e. int16 >> 2 and >> 3 with arithmetic shift.

_SEG_UEND = [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]
_SEG_AEND = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]
_ULAW_BIAS = 0x84 >> 2  # 33, already in the 14-bit domain
_ULAW_CLIP = 8159


def _seg_search(val, table):
    for i, end in enumerate(table):
        if val <= end:
            return i
    return len(table)


def ref_lin2ulaw(pcm: int) -> int:
    """CCITT st_14linear2ulaw on ``int16 >> 2`` (arithmetic shift)."""
    pcm >>= 2  # Python >> on ints is arithmetic: floors like C shorts
    if pcm < 0:
        pcm = -pcm
        mask = 0x7F
    else:
        mask = 0xFF
    if pcm > _ULAW_CLIP:
        pcm = _ULAW_CLIP
    pcm += _ULAW_BIAS
    seg = _seg_search(pcm, _SEG_UEND)
    if seg >= 8:
        return 0x7F ^ mask
    return ((seg << 4) | ((pcm >> (seg + 1)) & 0xF)) ^ mask


def ref_lin2alaw(pcm: int) -> int:
    """CCITT st_linear2alaw on ``int16 >> 3`` (arithmetic shift)."""
    pcm >>= 3
    if pcm >= 0:
        mask = 0xD5  # sign bit set, even bits inverted
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg = _seg_search(pcm, _SEG_AEND)
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    if seg < 2:
        aval |= (pcm >> 1) & 0xF
    else:
        aval |= (pcm >> seg) & 0xF
    return aval ^ mask


# --- IMA / DVI ADPCM ----------------------------------------------------
# The Intel/DVI reference coder (IMA ADPCM, as published in the IMA
# Recommended Practices and mirrored by the stdlib's adpcm module).

IMA_INDEX_TABLE = [-1, -1, -1, -1, 2, 4, 6, 8] * 2
IMA_STEP_TABLE = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17,
    19, 21, 23, 25, 28, 31, 34, 37, 41, 45,
    50, 55, 60, 66, 73, 80, 88, 97, 107, 118,
    130, 143, 157, 173, 190, 209, 230, 253, 279, 307,
    337, 371, 408, 449, 494, 544, 598, 658, 724, 796,
    876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358,
    5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]


def ref_ima_encode(samples, valpred: int, index: int):
    """Encode int16 samples to 4-bit IMA nibbles (one int per sample)."""
    nibbles = []
    for val in samples:
        step = IMA_STEP_TABLE[index]
        diff = int(val) - valpred
        sign = 8 if diff < 0 else 0
        if sign:
            diff = -diff
        delta = 0
        vpdiff = step >> 3
        if diff >= step:
            delta = 4
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 2
            diff -= step
            vpdiff += step
        step >>= 1
        if diff >= step:
            delta |= 1
            vpdiff += step
        valpred = valpred - vpdiff if sign else valpred + vpdiff
        valpred = max(-32768, min(32767, valpred))
        delta |= sign
        index = max(0, min(88, index + IMA_INDEX_TABLE[delta]))
        nibbles.append(delta)
    return nibbles


# --- MS-ADPCM ------------------------------------------------------------
# The Microsoft multimedia registration's WAVE_FORMAT_ADPCM pseudocode,
# one sample at a time (used by the encode tests; the decode test keeps
# its own inline copy written independently in r12).

MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614,
            768, 614, 512, 409, 307, 230, 230, 230]


def ref_ms_decode(nibbles, c1: int, c2: int, delta: int, s1: int, s2: int):
    """Decode one channel's nibble stream; returns ALL samples
    including the two header samples (s2 first, then s1)."""
    out = [s2, s1]
    for nib in nibbles:
        snib = nib - 16 if nib & 8 else nib
        pred = (s1 * c1 + s2 * c2) >> 8
        pred += snib * delta
        pred = max(-32768, min(32767, pred))
        s2, s1 = s1, pred
        delta = max((MS_ADAPT[nib] * delta) >> 8, 16)
        out.append(pred)
    return out


def ref_ima_decode(nibbles, valpred: int, index: int):
    """Decode 4-bit IMA nibbles to int16 samples (predictor NOT emitted)."""
    out = []
    step = IMA_STEP_TABLE[index]
    for delta in nibbles:
        index = max(0, min(88, index + IMA_INDEX_TABLE[delta]))
        sign = delta & 8
        mag = delta & 7
        vpdiff = step >> 3
        if mag & 4:
            vpdiff += step
        if mag & 2:
            vpdiff += step >> 1
        if mag & 1:
            vpdiff += step >> 2
        valpred = valpred - vpdiff if sign else valpred + vpdiff
        valpred = max(-32768, min(32767, valpred))
        step = IMA_STEP_TABLE[index]
        out.append(valpred)
    return out
