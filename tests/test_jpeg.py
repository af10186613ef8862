"""Stdlib baseline JPEG codec: round-trip fidelity, every encoder
variant the decoder must handle (4:4:4, 4:2:0, grayscale, restart
markers, odd dimensions), and honest rejection of everything the
baseline process excludes. Pure numpy — no Spark session."""

import numpy as np
import pytest

from sparkbm25.jpeg import ZIGZAG, encode_jpeg, parse_jpeg


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG.tolist()) == list(range(64))
    # spec spot-checks: the first diagonal and the tail
    assert ZIGZAG[:6].tolist() == [0, 1, 8, 16, 9, 2]
    assert ZIGZAG[-3:].tolist() == [55, 62, 63]


def test_solid_color_near_exact():
    a = np.zeros((24, 17, 3), np.uint8)
    a[:, :] = (200, 100, 50)
    for sub in ("444", "420"):
        for ri in (0, 2):
            dec = parse_jpeg(encode_jpeg(a, quality=95, subsampling=sub,
                                         restart_interval=ri))
            assert dec.shape == a.shape
            assert np.abs(dec.astype(int) - a.astype(int)).max() <= 2, \
                (sub, ri)


def test_smooth_gradient_high_psnr():
    y, x = np.mgrid[0:33, 0:41]
    g = np.stack([x * 255 // 40, y * 255 // 32,
                  (x + y) * 255 // 72], -1).astype(np.uint8)
    assert _psnr(g, parse_jpeg(encode_jpeg(g, 90, "444"))) > 40
    assert _psnr(g, parse_jpeg(encode_jpeg(g, 90, "420"))) > 35


def test_grayscale_single_component():
    y, x = np.mgrid[0:33, 0:41]
    g = (x * 255 // 40).astype(np.uint8)
    dec = parse_jpeg(encode_jpeg(g, quality=92))
    assert dec.shape == (33, 41, 1)
    assert np.abs(dec[:, :, 0].astype(int) - g.astype(int)).max() <= 3


@pytest.mark.parametrize("hw", [(1, 1), (7, 5), (8, 8), (17, 19),
                                (31, 64), (9, 8)])
@pytest.mark.parametrize("sub", ["444", "420"])
def test_noise_shapes_roundtrip(hw, sub):
    """Random noise is JPEG's worst case — shape and determinism must
    still hold at every odd/even dimension mix and MCU alignment."""
    rng = np.random.default_rng(hw[0] * 100 + hw[1])
    a = rng.integers(0, 256, (*hw, 3), dtype=np.uint8)
    enc = encode_jpeg(a, quality=85, subsampling=sub, restart_interval=1)
    assert enc == encode_jpeg(a, quality=85, subsampling=sub,
                              restart_interval=1)
    assert parse_jpeg(enc).shape == a.shape


def test_restart_markers_equal_no_restart():
    """Restart intervals change the byte stream (DC predictors reset)
    but must decode to the identical image."""
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (32, 24, 3), dtype=np.uint8)
    base = parse_jpeg(encode_jpeg(a, 80, "420", restart_interval=0))
    for ri in (1, 2, 5):
        np.testing.assert_array_equal(
            base, parse_jpeg(encode_jpeg(a, 80, "420",
                                         restart_interval=ri)))


def test_quality_orders_file_size_and_error():
    y, x = np.mgrid[0:48, 0:48]
    g = np.stack([x * 5, y * 5, (x * y) % 256], -1).astype(np.uint8)
    sizes, errs = [], []
    for q in (30, 60, 95):
        enc = encode_jpeg(g, quality=q)
        sizes.append(len(enc))
        errs.append(np.abs(parse_jpeg(enc).astype(int)
                           - g.astype(int)).mean())
    assert sizes[0] < sizes[1] < sizes[2]
    assert errs[0] > errs[2]


def test_rejects_non_baseline_and_garbage():
    good = encode_jpeg(np.zeros((8, 8, 3), np.uint8))
    for bad in (b"", b"junk", good[:20], b"\xff\xd8\xff\xd9"):
        with pytest.raises(ValueError):
            parse_jpeg(bad)
    # flip SOF0 to SOF2 (progressive) — must raise, not misdecode
    prog = bytearray(good)
    idx = prog.find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(ValueError, match="non-baseline"):
        parse_jpeg(bytes(prog))


def test_mutation_fuzz_always_valueerror():
    """Corrupted payloads must terminate in ValueError or a decoded
    image — never a hang, an unbounded allocation, or a stray
    exception type (the multimodal 'real' mode contract). A 5000-case
    offline fuzz ran clean; this keeps a bounded sample in CI."""
    rng = np.random.default_rng(2)
    base = encode_jpeg(rng.integers(0, 256, (24, 32, 3), dtype=np.uint8),
                       85, "420", 2)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        try:
            parse_jpeg(bytes(b))
        except ValueError:
            pass
    for cut in range(1, len(base), 11):
        try:
            parse_jpeg(base[:cut])
        except ValueError:
            pass


def test_multimodal_dispatch_decodes_jpeg():
    """The image kernel sniffs the container: JPEG payloads flow
    through the same grid fingerprint as PNG ones."""
    from sparkbm25 import multimodal as mm

    solid = np.zeros((24, 18, 3), dtype=np.uint8)
    solid[:, :] = (128, 64, 32)
    jpg = encode_jpeg(solid, quality=95)
    feat = mm._grid_feature(parse_jpeg(jpg), 27)
    np.testing.assert_allclose(
        feat.reshape(3, 3, 3),
        np.broadcast_to(np.array([128, 64, 32]) / 255.0, (3, 3, 3)),
        atol=2.5 / 255)
    np.testing.assert_allclose(mm._image_feature(jpg, 27), feat)
    # resize: JPEG in, PNG thumbnail out, still near the solid color
    thumb = mm._parse_png(mm._image_resize(jpg, 5, 4))
    assert thumb.shape == (4, 5, 3)
    assert np.abs(thumb.astype(int) - [128, 64, 32]).max() <= 2


def test_sampling_factor_zero_raises_valueerror():
    """A SOF component with sampling factor 0 must raise ValueError,
    not ZeroDivisionError (final-round review: the one-byte mutation
    0x11 -> 0x10 on the second component escaped the corruption
    contract at the upsample divide)."""
    y, x = np.mgrid[0:16, 0:16]
    img = np.stack([x * 15, y * 15, x + y], -1).astype(np.uint8)
    good = bytearray(encode_jpeg(img, 90, "420"))
    i = good.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) ncomp(1), then id,hv,tq per
    # component — patch component 2's hv byte
    hv2 = i + 2 + 2 + 1 + 2 + 2 + 1 + 3 + 1
    assert good[hv2] == 0x11
    good[hv2] = 0x10
    with pytest.raises(ValueError, match="sampling factor"):
        parse_jpeg(bytes(good))


def test_fill_bytes_before_marker_accepted():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; the walk previously desynced and rejected such streams
    (final-round review)."""
    img = np.full((16, 16, 3), 128, np.uint8)
    raw = encode_jpeg(img, 90, "444")
    i = raw.find(b"\xff\xdb")
    padded = raw[:i] + b"\xff\xff\xff" + raw[i:]
    np.testing.assert_array_equal(parse_jpeg(padded), parse_jpeg(raw))


def test_grayscale_declared_2x2_sampling_decodes_raster():
    """T.81 A.2: a single-component scan is non-interleaved — blocks
    run in raster order regardless of declared sampling factors. A
    grayscale file declaring 2x2 previously demanded 4-blocks-per-MCU
    tile order and rejected/scrambled valid streams (final-round
    review)."""
    g = ((np.arange(24 * 24).reshape(24, 24) * 3) % 256).astype(np.uint8)
    raw = bytearray(encode_jpeg(g, 92, "444"))
    i = raw.find(b"\xff\xc0")
    hv1 = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert raw[hv1] == 0x11
    raw[hv1] = 0x22      # declare 2x2 on the sole component
    np.testing.assert_array_equal(parse_jpeg(bytes(raw)),
                                  parse_jpeg(encode_jpeg(g, 92, "444")))


def test_mjpeg_stream_without_dht_uses_annex_k_defaults():
    """Real-world MJPEG frames conventionally omit DHT (decoders must
    supply the typical Annex K tables). Stripping every DHT from a
    stream our encoder produced (it writes exactly those tables) must
    decode to identical pixels (final-round review)."""
    y, x = np.mgrid[0:17, 0:23]
    img = np.stack([x * 11, y * 9, x * y], -1).astype(np.uint8)
    raw = encode_jpeg(img, 85, "420")
    out = bytearray()
    pos = 0
    while pos < len(raw):
        if raw[pos] == 0xFF and pos + 4 <= len(raw) and raw[pos + 1] == 0xC4:
            (seglen,) = np.frombuffer(raw[pos + 2:pos + 4], ">u2")
            pos += 2 + int(seglen)
            continue
        out.append(raw[pos])
        pos += 1
    stripped = bytes(out)
    assert b"\xff\xc4" not in stripped[:stripped.find(b"\xff\xda")]
    np.testing.assert_array_equal(parse_jpeg(stripped), parse_jpeg(raw))
