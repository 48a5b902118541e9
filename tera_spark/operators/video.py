"""Y4M (YUV4MPEG2) video codec, pure stdlib — the REAL video tier.

Until round 5 the video modality was metadata-only (frame_sample_plan
fans out frame indices from ``meta['n_frames']`` without touching
payloads). Y4M is the uncompressed interchange format every video tool
emits (`ffmpeg -f yuv4mpegpipe`, mjpegtools, y4m reference streams):
a one-line ASCII stream header (width/height/framerate/chroma mode)
followed by ``FRAME\\n`` + raw planar YUV per frame — parseable with
nothing but the stdlib, so frame decode/sampling runs for REAL here,
while compressed containers (MP4/H.264, WebM) remain the documented
external-codec stub tier.

`extract_frames` is the production shape of distributed video
processing: Arrow-batched `mapInPandas`, each input asset exploding to
one output row per SAMPLED frame with per-frame luma features — the
payload is decoded once per partition-local task and never crosses a
shuffle.

Fixture contract (synth in multimodal.py): frame f of asset id is a
CONSTANT luma plane with value ``(id * 53 + f * 19) % 256`` — the
closed form the SQL oracle replays without parsing Y4M.
"""

from __future__ import annotations

Y4M_MAGIC = b"YUV4MPEG2 "


def _plane_sizes(w: int, h: int, cmode: str) -> tuple[int, int]:
    """(luma_bytes, chroma_bytes_total) per frame for the chroma mode."""
    y = w * h
    if cmode.startswith("420"):
        return y, 2 * ((w + 1) // 2) * ((h + 1) // 2)
    if cmode.startswith("422"):
        return y, 2 * ((w + 1) // 2) * h
    if cmode.startswith("444"):
        return y, 2 * y
    if cmode == "mono":
        return y, 0
    raise NotImplementedError(f"Y4M chroma mode C{cmode}")


def parse_y4m_header(payload: bytes) -> dict:
    """Stream-level metadata without touching frame data."""
    if payload[:10] != Y4M_MAGIC:
        raise ValueError("not a Y4M payload")
    nl = payload.index(b"\n")
    w = h = None
    fps_num, fps_den = 30, 1
    cmode = "420jpeg"  # the spec default when C is absent
    for tok in payload[10:nl].split(b" "):
        if not tok:
            continue
        k, v = tok[:1], tok[1:]
        if k == b"W":
            w = int(v)
        elif k == b"H":
            h = int(v)
        elif k == b"F":
            num, den = v.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif k == b"C":
            cmode = v.decode()
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    return {
        "width": w,
        "height": h,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "chroma": cmode,
        "data_start": nl + 1,
    }


def decode_y4m(payload: bytes, *, frames: list[int] | None = None) -> dict:
    """Decode a Y4M stream. Returns {width, height, fps_num, fps_den,
    n_frames, frames: {idx: luma_bytes}} — luma planes only (the
    feature/fingerprint path; chroma is skipped over, not converted).
    ``frames=None`` decodes every frame; otherwise only the listed
    indices are materialized while the rest are seek-skipped (frame
    size is constant, so sampling never reads unwanted frame data)."""
    meta = parse_y4m_header(payload)
    w, h = meta["width"], meta["height"]
    y_sz, c_sz = _plane_sizes(w, h, meta["chroma"])
    want = set(frames) if frames is not None else None
    out: dict[int, bytes] = {}
    pos = meta["data_start"]
    idx = 0
    while pos < len(payload):
        nl = payload.find(b"\n", pos)
        if nl < 0:
            break  # torn mid frame-header: stop at the last whole frame
        if payload[pos : pos + 5] != b"FRAME":
            raise ValueError(f"expected FRAME marker at {pos}")
        pos = nl + 1
        if pos + y_sz + c_sz > len(payload):
            break  # truncated tail frame: stop at the last whole frame
        if want is None or idx in want:
            out[idx] = payload[pos : pos + y_sz]
        pos += y_sz + c_sz
        idx += 1
    return {
        "width": w,
        "height": h,
        "fps_num": meta["fps_num"],
        "fps_den": meta["fps_den"],
        "n_frames": idx,
        "frames": out,
    }


def encode_y4m_gray(
    width: int, height: int, frames: list[bytes], *, fps: tuple[int, int] = (30, 1)
) -> bytes:
    """Real Y4M encoder, C420jpeg with flat 128 chroma — every tool's
    default interchange layout. Lossless for the luma plane (raw
    bytes), so any frame content round-trips exactly."""
    w2h2 = ((width + 1) // 2) * ((height + 1) // 2)
    chroma = bytes([128]) * (2 * w2h2)
    out = bytearray(
        b"YUV4MPEG2 W%d H%d F%d:%d Ip A1:1 C420jpeg\n"
        % (width, height, fps[0], fps[1])
    )
    for fr in frames:
        if len(fr) != width * height:
            raise ValueError(f"frame needs {width * height} luma bytes, got {len(fr)}")
        out += b"FRAME\n" + fr + chroma
    return bytes(out)
