"""Multimodal (image/audio/video) column plumbing.

Opaque media travel as ``binary`` columns with a typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` operators so bytes stream through executors in columnar
batches and never transit the driver.

Decoding: formats that need no external codec libraries — PPM (P6) and
uncompressed 24-bit BMP — decode for real through :func:`decode_image`
(pure numpy; ``extract_features(fake=False)`` computes genuine pixel
statistics). Compressed formats (JPEG/PNG) decode through Pillow when
it is importable (optional, absent from this container) and raise a
clear ValueError otherwise; video frame extraction would slot into the
same kernel behind ffmpeg. ``fake=True`` keeps the deterministic
bytes-derived extractor for plumbing tests independent of any codec.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame as SDF, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)


def attach_media(sdf: SDF, payload_col: str, mime: str = "application/octet-stream") -> SDF:
    """Promote a binary column to the media schema (payload + meta)."""
    return sdf.withColumn(
        "meta",
        F.struct(
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    ).withColumnRenamed(payload_col, "payload")


_FEATURE_SCHEMA = "media_id long, n_bytes long, digest string, features array<double>"


def _pil_decode(raw: bytes):
    """Decode via Pillow when importable (JPEG/PNG/anything PIL reads);
    returns None when PIL is absent so the caller falls through to the
    no-codec error. Import is per-call inside the executor process —
    cheap after the first (module cache) and never a driver-only check."""
    try:
        from PIL import Image
    except ImportError:
        return None
    import io

    import numpy as np

    try:
        img = Image.open(io.BytesIO(raw)).convert("RGB")
    except Exception:
        # undecodable bytes (UnidentifiedImageError etc.) fall through to
        # decode_image's documented ValueError — the contract is one
        # exception type regardless of whether Pillow is installed
        return None
    return np.asarray(img, dtype=np.uint8).copy()


def decode_image(raw: bytes):
    """Decode PPM (P6, maxval<=255) or uncompressed 24-bit BMP bytes to a
    (height, width, 3) uint8 RGB numpy array — pure numpy, no codec
    library. JPEG/PNG and other compressed formats decode through Pillow
    WHEN it is importable (optional dependency, absent from this
    container); otherwise they raise a clear ValueError."""
    import numpy as np

    if raw[:2] == b"P6":
        # header: P6 <w> <h> <maxval> with whitespace/comments, then raw RGB
        pos, fields = 2, []
        while len(fields) < 3:
            while pos < len(raw) and raw[pos : pos + 1].isspace():
                pos += 1
            if raw[pos : pos + 1] == b"#":
                while pos < len(raw) and raw[pos] != 0x0A:
                    pos += 1
                continue
            start = pos
            while pos < len(raw) and not raw[pos : pos + 1].isspace():
                pos += 1
            fields.append(int(raw[start:pos]))
        pos += 1  # single whitespace after maxval
        w, h, maxval = fields
        if maxval > 255:
            raise ValueError("16-bit PPM not supported")
        px = np.frombuffer(raw, dtype=np.uint8, count=w * h * 3, offset=pos)
        return px.reshape(h, w, 3).copy()
    if raw[:2] == b"BM":
        off = int.from_bytes(raw[10:14], "little")
        w = int.from_bytes(raw[18:22], "little", signed=True)
        h = int.from_bytes(raw[22:26], "little", signed=True)
        bpp = int.from_bytes(raw[28:30], "little")
        comp = int.from_bytes(raw[30:34], "little")
        if bpp != 24 or comp != 0:
            raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp}, comp={comp})")
        flip = h > 0  # positive height = bottom-up row order
        h = abs(h)
        stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
        rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=off).reshape(h, stride)
        img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
        return (img[::-1] if flip else img).copy()
    decoded = _pil_decode(raw)
    if decoded is not None:
        return decoded
    raise ValueError(
        f"undecodable media magic {raw[:2]!r}: PPM(P6)/BMP decode only "
        "without codec libs (install Pillow for JPEG/PNG)"
    )


def extract_features(sdf: SDF, id_col: str = "media_id", payload_col: str = "payload", fake: bool = True, dim: int = 8) -> SDF:
    """Per-item feature extraction via mapInPandas (Arrow batches).

    ``fake=False`` REALLY decodes each payload (:func:`decode_image`) and
    emits pixel statistics: [width, height, mean_r, mean_g, mean_b,
    std_gray, min_gray, max_gray] (padded/truncated to ``dim``).
    ``fake=True`` emits a deterministic function of the bytes (length +
    md5-derived values) so plumbing tests run without any decodable
    payload."""

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, sizes, digests, feats = [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                digest = hashlib.md5(raw).hexdigest()
                ids.append(mid)
                sizes.append(len(raw))
                digests.append(digest)
                if fake:
                    feats.append([int(digest[i * 2 : i * 2 + 2], 16) / 255.0 for i in range(dim)])
                else:
                    img = decode_image(raw)
                    gray = img.astype("float64").mean(axis=2)
                    v = [
                        float(img.shape[1]),
                        float(img.shape[0]),
                        float(img[:, :, 0].mean()),
                        float(img[:, :, 1].mean()),
                        float(img[:, :, 2].mean()),
                        float(gray.std()),
                        float(gray.min()),
                        float(gray.max()),
                    ]
                    feats.append((v + [0.0] * dim)[:dim])
            yield pd.DataFrame(
                {"media_id": ids, "n_bytes": sizes, "digest": digests, "features": feats}
            )

    return sdf.mapInPandas(op, _FEATURE_SCHEMA)


def parse_y4m(raw: bytes):
    """Parse uncompressed YUV4MPEG2 video bytes — pure python/numpy, no
    codec library (the video analogue of the PPM/BMP image decode).
    Returns (fps, width, height, frames) where frames is a list of raw
    per-frame plane bytes. Supports C420*/C422/C444/Cmono chroma modes.
    Raises ValueError for anything that is not a Y4M stream."""
    if not raw.startswith(b"YUV4MPEG2"):
        raise ValueError(
            f"undecodable video magic {raw[:9]!r}: YUV4MPEG2 decode only without codec libs"
        )
    nl = raw.index(b"\n")
    width = height = None
    fps = 25.0
    chroma = "420"
    for tok in raw[9:nl].split():
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            width = int(val)
        elif tag == b"H":
            height = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps = int(num) / int(den)
        elif tag == b"C":
            chroma = val.decode()
    if not width or not height:
        raise ValueError("Y4M header missing W/H")
    if chroma.startswith("420"):
        frame_len = width * height * 3 // 2
    elif chroma.startswith("422"):
        frame_len = width * height * 2
    elif chroma.startswith("444"):
        frame_len = width * height * 3
    elif chroma.startswith("mono"):
        frame_len = width * height
    else:
        raise ValueError(f"unsupported Y4M chroma mode {chroma!r}")
    frames, pos = [], nl + 1
    while pos < len(raw):
        if not raw.startswith(b"FRAME", pos):
            raise ValueError(f"corrupt Y4M: expected FRAME marker at byte {pos}")
        pos = raw.index(b"\n", pos) + 1  # FRAME line may carry params
        if len(raw) - pos < frame_len:
            raise ValueError(
                f"truncated Y4M: frame {len(frames)} has {len(raw) - pos} of "
                f"{frame_len} bytes"
            )
        frames.append(raw[pos : pos + frame_len])
        pos += frame_len
    # a header-only stream is VALID and yields zero frames — callers
    # (frame_sample) emit zero rows for it, unlike the non-Y4M stub's
    # >=1-row contract
    return fps, width, height, frames


def ffmpeg_available() -> bool:
    """True when the ffmpeg + ffprobe CLIs are on PATH — the compressed-
    video analogue of the PIL import gate (absent in this container;
    the decode path activates wherever a real deployment installs
    them)."""
    import shutil

    return shutil.which("ffmpeg") is not None and shutil.which("ffprobe") is not None


def ffmpeg_decode_frames(raw: bytes, every_ms: int = 1000):
    """Decode a COMPRESSED video container (mp4/webm/mkv/...) through the
    ffmpeg CLI, returning (fps, width, height, [rgb24 frame bytes])
    sampled every ``every_ms`` — or None when ffmpeg is absent so the
    caller falls through (mirrors _pil_decode's gate). Runs inside the
    executor process; payload goes through a temp file because most
    containers need seekable input for the moov atom."""
    if not ffmpeg_available():
        return None
    import json
    import os
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
        f.write(raw)
        path = f.name
    try:
        # ANY failure (no video stream, missing dimensions, timeouts,
        # unparsable probe json) falls through to None — the caller's
        # documented stub fallback; never fail the whole executor task
        probe = subprocess.run(
            [
                "ffprobe", "-v", "error", "-select_streams", "v:0",
                "-show_entries", "stream=width,height,r_frame_rate",
                "-of", "json", path,
            ],
            capture_output=True,
            timeout=60,
        )
        if probe.returncode != 0:
            return None
        streams = json.loads(probe.stdout).get("streams") or []
        if not streams or "width" not in streams[0] or "height" not in streams[0]:
            return None
        meta = streams[0]
        width, height = int(meta["width"]), int(meta["height"])
        num, den = meta.get("r_frame_rate", "25/1").split("/")
        fps = (int(num) / int(den)) if int(den) else 25.0
        out_fps = max(1e-6, 1000.0 / every_ms)
        dec = subprocess.run(
            [
                "ffmpeg", "-v", "error", "-i", path,
                "-vf", f"fps={out_fps}",
                "-f", "rawvideo", "-pix_fmt", "rgb24", "-",
            ],
            capture_output=True,
            timeout=300,
        )
        if dec.returncode != 0:
            return None
        frame_len = width * height * 3
        buf = dec.stdout
        frames = [
            buf[i : i + frame_len]
            for i in range(0, len(buf) - frame_len + 1, frame_len)
        ]
        return fps, width, height, frames
    except Exception:
        return None
    finally:
        os.unlink(path)


def _looks_like_container(raw: bytes) -> bool:
    """Cheap magic-byte sniff so frame_sample only spawns ffprobe for
    plausible video containers (mp4/mov ftyp, Matroska/WebM EBML,
    AVI RIFF, Ogg, MPEG-TS) — arbitrary binary payloads keep the free
    stub path even on ffmpeg-equipped hosts."""
    if len(raw) < 12:
        return False
    return (
        raw[4:8] == b"ftyp"
        or raw[:4] == b"\x1a\x45\xdf\xa3"
        or (raw[:4] == b"RIFF" and raw[8:12] == b"AVI ")
        or raw[:4] == b"OggS"
        or raw[:1] == b"\x47" and len(raw) > 188 and raw[188:189] == b"\x47"
    )


def frame_sample(sdf: SDF, every_ms: int = 1000, id_col: str = "media_id", payload_col: str = "payload") -> SDF:
    """Sample frames every ``every_ms`` of video time: emits
    (media_id, frame_idx, frame_payload) rows via the 1->N mapInPandas
    explode. Y4M (uncompressed YUV4MPEG2) payloads decode for REAL —
    header-declared fps picks the sampled frame indices and each emitted
    payload is that frame's raw planes. Other containers (mp4/webm) need
    ffmpeg, absent here: those payloads fall back to the deterministic
    64-byte-chunk stub (clearly fake, keeps plumbing tests codec-free)."""

    def op(batches):
        import pandas as pd

        ffmpeg_ok = ffmpeg_available()  # one PATH scan per task, not per row
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                if raw.startswith(b"YUV4MPEG2"):
                    fps, _w, _h, frames = parse_y4m(raw)
                    step = max(1, int(round(fps * every_ms / 1000.0)))
                    for i in range(0, len(frames), step):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(i)
                        rows["frame_payload"].append(frames[i])
                    continue
                decoded = (
                    ffmpeg_decode_frames(raw, every_ms)
                    if ffmpeg_ok and _looks_like_container(raw)
                    else None
                )
                if decoded is not None:
                    # compressed container through the gated ffmpeg CLI
                    # (already sampled at every_ms by the fps filter)
                    _fps, _w, _h, frames = decoded
                    for i, fr in enumerate(frames):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(i)
                        rows["frame_payload"].append(fr)
                    continue
                n_frames = max(1, min(5, len(raw) // 64))
                for i in range(n_frames):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_payload"].append(raw[i * 64 : (i + 1) * 64])
            yield pd.DataFrame(rows)

    return sdf.mapInPandas(op, "media_id long, frame_idx int, frame_payload binary")
