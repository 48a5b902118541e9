"""Real stdlib media codecs: PNG encode/decode (all 5 scanline filter
types, gray/RGB), WAV PCM16 round trip, real resize and pHash paths,
and the synthesized-media formulas the oracle SQL predicts."""

from __future__ import annotations

import struct
import zlib

import pytest

from tera_spark.operators.multimodal import (
    PNG_MAGIC,
    decode_audio,
    decode_image,
    decode_png,
    decode_wav,
    encode_png_gray,
    encode_wav_pcm16,
    phash64,
    resize_image,
)

W, H = 13, 9
PIX = bytes((i * 17 + 5) % 256 for i in range(W * H))


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_filtered(w: int, h: int, px: bytes, ftype: int) -> bytes:
    """Hand-encode a grayscale PNG using a specific scanline filter, so
    the decoder's unfiltering is tested against an independent coder."""
    rows, prev = [], bytes(w)
    for y in range(h):
        row = px[y * w : (y + 1) * w]
        enc = bytearray()
        for x in range(w):
            a = row[x - 1] if x >= 1 else 0
            b = prev[x]
            c = prev[x - 1] if x >= 1 else 0
            if ftype == 1:
                v = (row[x] - a) & 0xFF
            elif ftype == 2:
                v = (row[x] - b) & 0xFF
            elif ftype == 3:
                v = (row[x] - (a + b) // 2) & 0xFF
            else:
                p0 = a + b - c
                pa, pb, pc = abs(p0 - a), abs(p0 - b), abs(p0 - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = (row[x] - pred) & 0xFF
            enc.append(v)
        rows.append(bytes([ftype]) + bytes(enc))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        PNG_MAGIC
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )


def test_png_gray_round_trip():
    d = decode_png(encode_png_gray(W, H, PIX))
    assert (d["width"], d["height"], d["channels"]) == (W, H, 1)
    assert d["pixels"] == PIX


@pytest.mark.parametrize("ftype", [1, 2, 3, 4])
def test_png_decode_unfilters(ftype):
    assert decode_png(_png_filtered(W, H, PIX, ftype))["pixels"] == PIX


def test_png_decode_rgb():
    rgb = bytes((i * 7) % 256 for i in range(W * H * 3))
    raw = b"".join(b"\x00" + rgb[y * W * 3 : (y + 1) * W * 3] for y in range(H))
    p = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    d = decode_png(p)
    assert d["channels"] == 3 and d["pixels"] == rgb


def test_real_resize_nearest_neighbor():
    rz = decode_png(resize_image(encode_png_gray(W, H, PIX), 4, 4))
    expect = bytes(PIX[(y * H // 4) * W + (x * W // 4)] for y in range(4) for x in range(4))
    assert (rz["width"], rz["height"]) == (4, 4) and rz["pixels"] == expect


def test_wav_round_trip():
    samples = [((i * 13) % 2048 - 1024) * 16 for i in range(100)]
    d = decode_wav(encode_wav_pcm16(16000, samples))
    assert d["sample_rate"] == 16000 and d["n_samples"] == 100
    assert list(d["samples"]) == samples
    # canonical PCM container: 44-byte header + 2 bytes/sample (the
    # n_bytes formula the audio oracle predicts)
    assert len(encode_wav_pcm16(16000, samples)) == 44 + 2 * 100


def test_magic_routing():
    png = encode_png_gray(W, H, PIX)
    wav = encode_wav_pcm16(8000, [0] * 10)
    assert decode_image(png)["width"] == W  # no fake flag needed
    assert decode_audio(wav)["n_samples"] == 10
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8jpegdata")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3mp3data")


def test_phash_real_pixels_stable_under_reencode():
    """The hash must come from decoded pixels, not container bytes:
    re-encoding the same pixels at a different zlib level changes the
    payload but not the pHash."""
    p1 = encode_png_gray(W, H, PIX)
    body = b"".join(b"\x00" + PIX[y * W : (y + 1) * W] for y in range(H))
    p2 = (
        PNG_MAGIC
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", W, H, 8, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(body, 1))
        + _chunk(b"IEND", b"")
    )
    assert p1 != p2
    assert phash64(p1) == phash64(p2)
    near = bytes(min(b + 1, 255) for b in PIX)
    ham = bin(phash64(p1) ^ phash64(encode_png_gray(W, H, near))).count("1")
    assert ham <= 8  # near-identical image stays close


def test_synth_media_formulas(spark):
    """The synthesized fixtures decode back to exactly the closed-form
    values the oracle SQL predicts."""
    from tera_spark.operators.multimodal import (
        extract_audio_features,
        extract_features,
        synth_png_media,
        synth_wav_media,
    )

    docs = spark.createDataFrame([(6, 40), (12, 7)], "doc_id long, n_chars long")
    feats = {r.asset_id: r for r in extract_features(synth_png_media(docs)).collect()}
    for did, n in [(6, 40), (12, 7)]:
        w, h = 8 + did % 9, 8 + n % 7
        r = feats[did]
        assert (r.width, r.height, r.n_pixels) == (w, h, w * h)
        assert r.pixel_sum == sum((did * 131 + i * 17) % 256 for i in range(w * h))
    aud = {r.asset_id: r for r in extract_audio_features(synth_wav_media(docs)).collect()}
    for did, n in [(6, 40), (12, 7)]:
        rate, cnt = 8000 * (1 + did % 3), 64 + n % 128
        r = aud[did]
        assert (r.sample_rate, r.n_samples, r.n_bytes) == (rate, cnt, 44 + 2 * cnt)
        assert r.duration_ms == cnt * 1000 // rate
        assert r.amp_sum == sum(
            abs(((did * 7 + i * 13) % 2048 - 1024) * 16) for i in range(cnt)
        )


def test_real_decode_is_the_default():
    """Production default is REAL decode: genuine PNG/WAV containers
    decode without any kwarg, and undecodable formats raise instead of
    silently falling back to the fixture stand-in (fake is opt-in)."""
    import pytest

    from tera_spark.operators.multimodal import decode_audio, decode_image

    import inspect

    from tera_spark.operators.multimodal import (
        extract_audio_features,
        extract_features,
        phash_duplicates,
        resize_images,
    )

    for fn in (extract_features, extract_audio_features, resize_images, phash_duplicates):
        assert inspect.signature(fn).parameters["fake_decode"].default is False

    with pytest.raises(NotImplementedError):
        decode_image(b"BM not-a-png")  # BMP: no stdlib codec here
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04 not-a-wav")  # MP3 container


# --- baseline JPEG codec (operators/jpeg.py) ---------------------------


def _block_img(w, h, fn):
    import numpy as np

    img = np.zeros((h, w), dtype=np.uint8)
    wb = w // 8
    for by in range(h // 8):
        for bx in range(wb):
            img[by * 8 : (by + 1) * 8, bx * 8 : (bx + 1) * 8] = fn(by * wb + bx)
    return img


def test_jpeg_gray_block_constant_roundtrip_exact():
    """Block-constant grayscale under the flat quant table: DC-only
    blocks, bit-exact decode — the fixture contract the SQL oracle
    relies on."""
    import numpy as np

    from tera_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    img = _block_img(24, 16, lambda b: (7 * b + 13) % 256)
    d = decode_jpeg(encode_jpeg_gray(24, 16, img.tobytes()))
    assert (d["width"], d["height"], d["channels"]) == (24, 16, 1)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 24)
    assert (got == img).all()


def test_jpeg_color_420_flat_chroma_exact():
    """4:2:0 color with flat 128 chroma exercises multi-component scan
    order, chroma upsampling, and BT.601 — and still decodes exactly
    (R=G=B=Y when Cb=Cr=128)."""
    import numpy as np

    from tera_spark.operators.jpeg import decode_jpeg, encode_jpeg_ycbcr420

    img = _block_img(32, 16, lambda b: (11 * b + 5) % 256)
    d = decode_jpeg(encode_jpeg_ycbcr420(32, 16, img.tobytes()))
    assert (d["width"], d["height"], d["channels"]) == (32, 16, 3)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 32, 3)
    for c in range(3):
        assert (got[:, :, c] == img).all()


def test_jpeg_arbitrary_content_roundtrip_close():
    """General (non-block-constant) content through the full
    DCT→quant→Huffman→decode pipeline: lossy but tight under the flat
    q=8 table, including non-multiple-of-8 dimensions (edge padding +
    crop)."""
    import numpy as np

    from tera_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    img = np.array(
        [[(x * 7 + y * 31 + (x * y) % 5 * 40) % 256 for x in range(21)] for y in range(19)],
        dtype=np.uint8,
    )
    d = decode_jpeg(encode_jpeg_gray(21, 19, img.tobytes()))
    assert (d["width"], d["height"]) == (21, 19)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(19, 21)
    err = np.abs(got.astype(int) - img.astype(int))
    assert err.max() <= 12, f"max quantization error {err.max()}"


def test_jpeg_progressive_and_garbage_raise():
    import pytest

    from tera_spark.operators.jpeg import decode_jpeg, encode_jpeg_gray

    payload = bytearray(encode_jpeg_gray(8, 8, bytes(64)))
    i = payload.find(b"\xff\xc0")
    payload[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01\x02")


def test_jpeg_via_default_decode_path():
    """decode_image routes JPEG magic to the real decoder with no
    kwargs — JPEG is a REAL-tier codec now."""
    import numpy as np

    from tera_spark.operators.jpeg import encode_jpeg_gray
    from tera_spark.operators.multimodal import decode_image

    img = _block_img(8, 8, lambda b: 77)
    d = decode_image(encode_jpeg_gray(8, 8, img.tobytes()))
    assert d["channels"] == 1 and set(d["pixels"]) == {77}


def test_synth_jpeg_media_formulas(spark):
    """The JPEG fixtures decode back to exactly the closed-form
    values the multimodal_jpeg_features oracle predicts."""
    from tera_spark.operators.multimodal import extract_features, synth_jpeg_media

    docs = spark.createDataFrame([(14, 40), (7, 7)], "doc_id long, n_chars long")
    feats = {r.asset_id: r for r in extract_features(synth_jpeg_media(docs)).collect()}
    for did, n in [(14, 40), (7, 7)]:
        w, h = 8 * (1 + did % 3), 8 * (1 + n % 2)
        ch = 1 if did % 2 == 0 else 3
        wb = w // 8
        luma = sum(64 * ((did * 37 + b * 29) % 256) for b in range(wb * (h // 8)))
        r = feats[did]
        assert (r.width, r.height) == (w, h)
        assert r.n_pixels == w * h * ch
        assert r.pixel_sum == ch * luma


def test_jpeg_routes_through_resize_and_phash():
    """The same image in a JPEG or PNG container must pHash identically
    (hash comes from decoded pixels, not container bytes), and resize
    accepts JPEG input (emitting the lossless gray-PNG artifact)."""
    from tera_spark.operators.jpeg import encode_jpeg_gray
    from tera_spark.operators.multimodal import (
        decode_png,
        encode_png_gray,
        phash64,
        resize_image,
    )

    img = _block_img(16, 16, lambda b: 60 + 50 * b)
    jp = encode_jpeg_gray(16, 16, img.tobytes())
    pn = encode_png_gray(16, 16, img.tobytes())
    assert phash64(jp) == phash64(pn)
    rz = decode_png(resize_image(jp, 4, 4))
    assert (rz["width"], rz["height"]) == (4, 4)
    assert set(rz["pixels"]) == {60, 110, 160, 210}


# --- GIF codec (operators/gif.py) ---------------------------------------


def test_gif_lossless_roundtrip_any_content():
    """GIF is lossless: arbitrary content round-trips exactly,
    including streams long enough to span LZW CLEAR cycles and
    multiple 255-byte sub-blocks; the grayscale palette replicates
    each value to R=G=B."""
    from tera_spark.operators.gif import decode_gif, encode_gif_gray

    for w, h in [(7, 5), (37, 23), (100, 80)]:
        px = bytes((i * 17 + (i * i) % 7 * 31 + 5) % 256 for i in range(w * h))
        d = decode_gif(encode_gif_gray(w, h, px))
        assert (d["width"], d["height"], d["channels"], d["n_frames"]) == (w, h, 3, 1)
        assert bytes(d["pixels"][3 * i] for i in range(w * h)) == px
        assert all(
            d["pixels"][3 * i] == d["pixels"][3 * i + 1] == d["pixels"][3 * i + 2]
            for i in range(w * h)
        )


def test_gif_interlaced_and_multiframe():
    """Hand-build an interlaced 2-frame GIF: pass reordering recovers
    row order, and n_frames counts the walked frames."""
    import struct

    from tera_spark.operators.gif import (
        _INTERLACE_PASSES,
        _lzw_encode_literals,
        decode_gif,
        encode_gif_gray,
    )

    w, h = 8, 9
    px = bytes((r * 10 + c) % 256 for r in range(h) for c in range(w))
    # write rows in interlace pass order, flag the frame interlaced
    order = [r for start, step in _INTERLACE_PASSES for r in range(start, h, step)]
    ipx = b"".join(px[r * w : (r + 1) * w] for r in order)
    out = bytearray(b"GIF89a") + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    for frame_px, flags in [(ipx, 0x40), (px, 0)]:
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        out.append(8)
        lzw = _lzw_encode_literals(frame_px, 8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"

    d = decode_gif(bytes(out))
    assert d["n_frames"] == 2
    assert bytes(d["pixels"][3 * i] for i in range(w * h)) == px  # de-interlaced


def test_gif_via_default_paths():
    """decode_image / phash64 / resize route GIF magic to the real
    codec; the same image as GIF or PNG hashes identically."""
    from tera_spark.operators.gif import encode_gif_gray
    from tera_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png_gray,
        phash64,
        resize_image,
    )

    w, h = 16, 16
    px = bytes((i * 31 + 7) % 256 for i in range(w * h))
    g = encode_gif_gray(w, h, px)
    assert decode_image(g)["channels"] == 3
    assert phash64(g) == phash64(encode_png_gray(w, h, px))
    rz = decode_png(resize_image(g, 4, 4))
    assert (rz["width"], rz["height"]) == (4, 4)


def test_synth_gif_media_formulas(spark):
    """GIF fixtures decode back to exactly the closed-form values the
    multimodal_gif_features oracle predicts."""
    from tera_spark.operators.multimodal import extract_features, synth_gif_media

    docs = spark.createDataFrame([(8, 40), (16, 7)], "doc_id long, n_chars long")
    feats = {r.asset_id: r for r in extract_features(synth_gif_media(docs)).collect()}
    for did, n in [(8, 40), (16, 7)]:
        w, h = 6 + did % 11, 5 + n % 9
        sums = sum((did * 89 + i * 23) % 256 for i in range(w * h))
        r = feats[did]
        assert (r.width, r.height) == (w, h)
        assert r.n_pixels == 3 * w * h
        assert r.pixel_sum == 3 * sums


# --- Y4M video codec (operators/video.py) -------------------------------


def test_y4m_roundtrip_and_sampling():
    """Luma planes are raw bytes: any content round-trips exactly;
    sampled decode materializes only requested frames; truncated tail
    frames are dropped, not mis-read."""
    from tera_spark.operators.video import decode_y4m, encode_y4m_gray

    w, h = 11, 7
    frames = [bytes((f * 19 + i * 3) % 256 for i in range(w * h)) for f in range(5)]
    p = encode_y4m_gray(w, h, frames, fps=(24, 1))
    d = decode_y4m(p)
    assert (d["width"], d["height"], d["n_frames"], d["fps_num"]) == (w, h, 5, 24)
    assert all(d["frames"][f] == frames[f] for f in range(5))
    d2 = decode_y4m(p, frames=[0, 3])
    assert sorted(d2["frames"]) == [0, 3]
    dt = decode_y4m(p[: len(p) - 10])  # torn tail frame
    assert dt["n_frames"] == 4


def test_y4m_header_variants():
    import pytest

    from tera_spark.operators.video import parse_y4m_header

    m = parse_y4m_header(b"YUV4MPEG2 W320 H240 F30000:1001 Ip A1:1 C422\nFRAME\n")
    assert (m["width"], m["height"], m["chroma"]) == (320, 240, "422")
    assert (m["fps_num"], m["fps_den"]) == (30000, 1001)
    m2 = parse_y4m_header(b"YUV4MPEG2 W8 H8\n")  # C absent -> 420jpeg default
    assert m2["chroma"] == "420jpeg"
    with pytest.raises(ValueError):
        parse_y4m_header(b"RIFFxxxx")


def test_extract_frames_formulas(spark):
    """The Y4M fixtures flow through the mapInPandas frame extractor
    to exactly the closed-form values the oracle predicts."""
    from tera_spark.operators.multimodal import extract_frames, synth_y4m_media

    docs = spark.createDataFrame([(10, 40), (13, 7)], "doc_id long, n_chars long")
    rows = extract_frames(synth_y4m_media(docs), every_n=2).collect()
    got = {(r.asset_id, r.frame_idx): r for r in rows}
    for did, n in [(10, 40), (13, 7)]:
        w, h, nf = 8 + did % 6, 6 + n % 5, 2 + did % 5
        wanted = list(range(0, nf, 2))
        assert [k for k in sorted(got) if k[0] == did] == [(did, f) for f in wanted]
        for f in wanted:
            r = got[(did, f)]
            assert (r.width, r.height, r.n_frames) == (w, h, nf)
            assert r.luma_sum == w * h * ((did * 53 + f * 19) % 256)


# --- G.711 mu-law WAV (manual RIFF walk) --------------------------------


def test_mulaw_expand_known_values():
    """Spot-check the G.711 expansion against spec landmarks: 0xFF/0x7F
    are +/-0, 0x00 is the maximum negative (-32124), and expansion is
    antisymmetric under sign-bit flip."""
    from tera_spark.operators.multimodal import mulaw_expand

    assert mulaw_expand(0xFF) == 0 and mulaw_expand(0x7F) == 0
    assert mulaw_expand(0x00) == -32124 and mulaw_expand(0x80) == 32124
    for c in range(128):
        assert mulaw_expand(c) == -mulaw_expand(c | 0x80)


def test_mulaw_wav_roundtrip_and_routing():
    from tera_spark.operators.multimodal import (
        decode_audio,
        decode_wav,
        encode_wav_mulaw,
        mulaw_expand,
    )

    codes = bytes((i * 37 + 3) % 256 for i in range(200))
    p = encode_wav_mulaw(16000, codes)
    assert len(p) == 58 + 200  # the oracle's container-size formula
    d = decode_wav(p)
    assert (d["sample_rate"], d["n_samples"], d["channels"]) == (16000, 200, 1)
    assert list(d["samples"]) == [mulaw_expand(c) for c in codes]
    assert decode_audio(p)["n_samples"] == 200  # RIFF magic routing


def test_synth_mulaw_formulas(spark):
    from tera_spark.operators.multimodal import (
        extract_audio_features,
        mulaw_expand,
        synth_mulaw_media,
    )

    docs = spark.createDataFrame([(11, 40), (22, 7)], "doc_id long, n_chars long")
    feats = {
        r.asset_id: r
        for r in extract_audio_features(synth_mulaw_media(docs)).collect()
    }
    for did, n in [(11, 40), (22, 7)]:
        cnt = 50 + n % 100
        r = feats[did]
        assert (r.sample_rate, r.n_samples, r.n_bytes) == (8000, cnt, 58 + cnt)
        assert r.amp_sum == sum(
            abs(mulaw_expand((did * 31 + i * 7) % 256)) for i in range(cnt)
        )


def test_all_codecs_fail_typed_on_corruption():
    """Crawl robustness across the whole codec tier: bit-flipped and
    truncated payloads with valid magics must fail with TYPED errors
    (ValueError/NotImplementedError/EOFError) — never IndexError /
    KeyError / zlib.error / wave's bare RuntimeError escaping the
    decode boundary. (Round 6: _typed_decode dispatch + per-decoder
    dimension caps; found live holes in PNG/JPEG/GIF/WAV.)"""
    import numpy as np

    from tera_spark.operators.gif import encode_gif_gray
    from tera_spark.operators.jpeg import encode_jpeg_gray
    from tera_spark.operators.multimodal import (
        decode_audio,
        decode_image,
        encode_png_gray,
        encode_wav_pcm16,
    )
    from tera_spark.operators.video import decode_y4m, encode_y4m_gray
    from tera_spark.operators.vp8l import encode_vp8l

    rng = np.random.RandomState(77)
    w, h = 12, 9
    gray = bytes(int(x) for x in rng.randint(0, 256, w * h))
    rgba = bytes(int(x) for x in rng.randint(0, 256, w * h * 4))
    frames = [bytes((f * 19 + i * 7) % 256 for i in range(w * h)) for f in range(2)]
    cases = [
        (encode_png_gray(w, h, gray), decode_image, 8),
        (encode_jpeg_gray(w, h, gray), decode_image, 3),
        (encode_gif_gray(w, h, gray), decode_image, 6),
        (encode_vp8l(w, h, rgba), decode_image, 12),
        (encode_wav_pcm16(8000, [90, -90] * 200), decode_audio, 12),
        (encode_y4m_gray(w, h, frames), decode_y4m, 9),
    ]
    allowed = (ValueError, NotImplementedError, EOFError)
    for good, dec, start in cases:
        for _ in range(250):
            buf = bytearray(good)
            i = int(rng.randint(start, len(buf)))
            buf[i] ^= 1 << int(rng.randint(0, 8))
            try:
                dec(bytes(buf))
            except allowed:
                pass
        for _ in range(60):
            cut = int(rng.randint(start + 1, len(good)))
            try:
                dec(bytes(good[:cut]))
            except allowed:
                pass


def test_decode_dimension_caps():
    """A corrupt header claiming absurd dimensions must refuse BEFORE
    allocating (the 64M-pixel cap), not OOM."""
    import struct
    import zlib

    import pytest

    from tera_spark.operators.multimodal import PNG_MAGIC, decode_image

    def chunk(tag, body):
        return struct.pack(">I", len(body)) + tag + body + struct.pack(
            ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
        )

    ihdr = struct.pack(">IIBBBBB", 1 << 15, 1 << 15, 8, 0, 0, 0, 0)  # 1G pixels
    evil = PNG_MAGIC + chunk(b"IHDR", ihdr) + chunk(b"IDAT", b"x") + chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="cap"):
        decode_image(evil)


def test_extract_features_quarantine_policy(spark):
    """on_error='quarantine': corrupt assets yield width=-1 rows
    instead of killing the task; on_error='fail' keeps strict
    semantics. Byte columns stay populated either way so the asset can
    be routed to a quarantine sink."""
    from tera_spark.operators.multimodal import encode_png_gray, extract_features

    good = encode_png_gray(4, 3, bytes(range(12)))
    bad = good[:40] + bytes(4) + good[44:]  # corrupt the IDAT zlib stream
    media = spark.createDataFrame(
        [(1, "image", bytearray(good), None), (2, "image", bytearray(bad), None)],
        "asset_id long, media_type string, payload binary, meta string",
    )
    rows = {r.asset_id: r for r in extract_features(media, on_error="quarantine").collect()}
    assert rows[1].width == 4 and rows[1].n_pixels == 12
    assert rows[2].width == -1 and rows[2].n_pixels == 0
    assert rows[2].n_bytes == len(bad) and rows[2].head_byte == good[0]

    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):  # strict mode: the task fails loudly
        extract_features(media, on_error="fail").collect()
    with pytest.raises(ValueError, match="on_error"):
        extract_features(media, on_error="bogus")
