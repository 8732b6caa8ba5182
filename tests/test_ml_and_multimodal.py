import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from arlas_proc_ray.stages.ml import (
    STILLMOVE_MODEL_JSON,
    HmmModel,
    with_hmm_states,
)


def test_hmm_model_quantize_and_viterbi():
    m = HmmModel.from_json(STILLMOVE_MODEL_JSON)
    bins = m.quantize(np.array([0.5, 0.5, 100.0, 100.0, 100.0, 0.2]))
    assert bins.tolist() == [0, 0, 3, 3, 3, 0]
    path = m.viterbi(bins)
    states = np.asarray(m.states)[path]
    # low values decode STILL, sustained high values decode MOVE
    assert states[0] == "STILL" and states[2] == "MOVE" and states[3] == "MOVE"


def test_with_hmm_states_dataset():
    df = pd.DataFrame(
        {
            "id": ["a"] * 6 + ["b"] * 3,
            "seq": list(range(6)) + list(range(3)),
            "v": [0.1, 0.2, 90.0, 95.0, 0.1, 0.1, 100.0, 120.0, 140.0],
        }
    )
    out = (
        with_hmm_states(
            rd.from_pandas(df),
            keys=["id"],
            order_col="seq",
            obs_col="v",
            model_json=STILLMOVE_MODEL_JSON,
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["id", "seq"])
        .reset_index(drop=True)
    )
    a = out[out.id.eq("a")]["hmm_state"].tolist()
    b = out[out.id.eq("b")]["hmm_state"].tolist()
    assert a[2] == "MOVE" and a[0] == "STILL"
    assert b == ["MOVE", "MOVE", "MOVE"]


def test_hmm_windowing_consistency():
    """Windows decode independently — same result regardless of cap."""
    df = pd.DataFrame(
        {
            "id": ["a"] * 40,
            "seq": range(40),
            "v": ([0.1] * 10 + [90.0] * 10) * 2,
        }
    )
    full = with_hmm_states(
        rd.from_pandas(df), keys=["id"], order_col="seq", obs_col="v",
        model_json=STILLMOVE_MODEL_JSON, window_size=5000, num_partitions=1,
    ).to_pandas().sort_values("seq")["hmm_state"].tolist()
    win = with_hmm_states(
        rd.from_pandas(df), keys=["id"], order_col="seq", obs_col="v",
        model_json=STILLMOVE_MODEL_JSON, window_size=20, num_partitions=1,
    ).to_pandas().sort_values("seq")["hmm_state"].tolist()
    assert len(full) == len(win) == 40
    # windows are independent Viterbi runs — identical on window-aligned
    # state blocks (10-step runs align with the 20-row window here)
    assert full == win


def test_multimodal_plumbing():
    from arlas_proc_ray.multimodal import (
        DecodeImageStub,
        FakeFeatureExtractor,
        frame_sample_plan,
        with_binary_metadata,
    )

    t = pa.table(
        {
            "id": [1, 2],
            "payload": pa.array([b"\x89PNG fake", b"RIFF fake"], type=pa.binary()),
            "media_type": ["image/png", "audio/wav"],
        }
    )
    t2 = with_binary_metadata(t)
    assert t2.column("byte_size").to_pylist() == [9, 9]
    import hashlib

    assert t2.column("payload_sha256").to_pylist()[0] == hashlib.sha256(
        b"\x89PNG fake"
    ).hexdigest()

    with pytest.raises(NotImplementedError):
        DecodeImageStub()(t2)

    ds = rd.from_arrow(t2)
    out = ds.map_batches(
        FakeFeatureExtractor,
        fn_constructor_kwargs={"dim": 8},
        batch_format="pyarrow",
        batch_size=1,  # large payloads → small batches
        concurrency=2,
    ).to_pandas()
    assert len(out) == 2
    v = np.array(out["features"].iloc[0])
    assert v.shape == (8,) and abs(np.linalg.norm(v) - 1.0) < 1e-5

    plan = frame_sample_plan(duration_s=10.0, fps=30.0, every_s=2.5)
    assert plan.tolist() == [0, 75, 150, 225]


def test_with_tempo_null_fill_and_states():
    from arlas_proc_ray.stages.ml import with_tempo

    ts = pd.to_datetime(
        ["2024-01-01 00:00", "2024-01-01 00:10", "2024-01-01 00:20",
         "2024-01-05 00:20", "2024-01-09 00:20"]
    )
    df = pd.DataFrame({"id": ["a"] * 5, "seq": range(5), "ts": ts})
    out = (
        with_tempo(
            rd.from_pandas(df), keys=["id"], order_col="seq", ts_col="ts",
            num_partitions=1,
        )
        .to_pandas()
        .sort_values("seq")["tempo"]
        .tolist()
    )
    assert out[0] == "tempo_irregular"  # first obs: no duration
    assert out[1] == "tempo_fast" and out[2] == "tempo_fast"  # 10-min gaps
    assert out[3] == "tempo_slow" and out[4] == "tempo_slow"  # multi-day gaps


def test_with_tempo_composite_keys():
    """Viterbi boundaries must split on the FULL key tuple: two entities
    sharing keys[0] decode independently (round-1 ADVICE regression)."""
    from arlas_proc_ray.stages.ml import with_tempo

    fast = pd.date_range("2024-01-01", periods=4, freq="10min")
    slow = pd.date_range("2024-01-01", periods=4, freq="5D")
    df = pd.DataFrame(
        {
            "fleet": ["f1"] * 8,
            "unit": ["u1"] * 4 + ["u2"] * 4,
            "seq": list(range(4)) * 2,
            "ts": list(fast) + list(slow),
        }
    )
    out = (
        with_tempo(
            rd.from_pandas(df),
            keys=["fleet", "unit"],
            order_col="seq",
            ts_col="ts",
            num_partitions=1,
        )
        .to_pandas()
        .sort_values(["unit", "seq"])
    )
    u1 = out[out["unit"] == "u1"]["tempo"].tolist()
    u2 = out[out["unit"] == "u2"]["tempo"].tolist()
    # each unit's FIRST row is irregular — u2's first row must not inherit
    # a duration across the u1/u2 boundary
    assert u1[0] == "tempo_irregular" and u2[0] == "tempo_irregular"
    assert u1[1:] == ["tempo_fast"] * 3
    assert u2[1:] == ["tempo_slow"] * 3


def test_real_wav_decode_pipeline():
    """REAL audio decode end-to-end: synthesize WAV payloads, run the
    DecodeAudio actor-pool stage over a Dataset, check physics."""
    import numpy as np
    import pyarrow as pa

    from arlas_proc_ray.multimodal.codecs import DecodeAudio, encode_wav

    rate = 8000
    t = np.arange(rate) / rate  # 1 second
    tone_440 = 0.5 * np.sin(2 * np.pi * 440 * t)
    silence = np.zeros(rate // 2)
    tbl = pa.table(
        {
            "media_id": [1, 2, 3],
            "payload": pa.array(
                [encode_wav(tone_440, rate), encode_wav(silence, rate), None],
                type=pa.binary(),
            ),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeAudio, batch_format="pyarrow", batch_size=2,
                     concurrency=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    tone = out.iloc[0]
    assert abs(tone["duration_s"] - 1.0) < 1e-9
    assert abs(tone["rms"] - 0.5 / np.sqrt(2)) < 1e-3
    assert abs(tone["spectral_centroid_hz"] - 440.0) < 5.0
    assert tone["sample_rate"] == rate
    sil = out.iloc[1]
    assert sil["rms"] == 0.0 and abs(sil["duration_s"] - 0.5) < 1e-9
    assert pd.isna(out.iloc[2]["duration_s"])  # null payload -> nulls


def test_real_image_decode_pipeline():
    """REAL netpbm decode: P6 gradient image through DecodeImage with
    nearest-neighbor thumbnailing; compressed formats raise at the seam."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from arlas_proc_ray.multimodal.codecs import (
        DecodeImage,
        UnsupportedMediaError,
        decode_pnm,
        encode_pnm,
        resize_nearest,
    )

    img = np.zeros((16, 32, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(32, dtype=np.uint8)[None, :] * 8  # red ramp
    payload = encode_pnm(img)
    np.testing.assert_array_equal(decode_pnm(payload), img)

    gray = (np.arange(64, dtype=np.uint8).reshape(8, 8)) * 4
    tbl = pa.table(
        {
            "media_id": [1, 2],
            "payload": pa.array([payload, encode_pnm(gray)], type=pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeImage, batch_format="pyarrow", batch_size=1,
                     concurrency=1,
                     fn_constructor_kwargs={"target_size": (4, 4)})
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, ["height", "width", "channels"]].tolist() == [16, 32, 3]
    assert out.loc[1, ["height", "width", "channels"]].tolist() == [8, 8, 1]
    assert len(out.loc[0, "thumb"]) == 4 * 4 * 3
    assert abs(out.loc[0, "mean_intensity"] - img.mean()) < 1e-9
    # resize is an exact index gather
    np.testing.assert_array_equal(
        resize_nearest(gray, (2, 2)), gray[[0, 4]][:, [0, 4]]
    )
    # compressed formats still raise at the documented seam
    with pytest.raises(UnsupportedMediaError):
        decode_pnm(b"\x89PNG\r\n\x1a\n....")


def test_png_decode_all_filters_and_pipeline():
    """Pure stdlib-zlib PNG decode: roundtrip across every scanline filter
    and channel count, plus the mixed PNG+netpbm Dataset pipeline."""
    import numpy as np
    import pyarrow as pa
    import pytest

    from arlas_proc_ray.multimodal.codecs import (
        DecodeImage,
        UnsupportedMediaError,
        decode_png,
        encode_png,
        encode_pnm,
    )

    rng = np.random.RandomState(4)
    for shape in [(5, 7), (6, 4, 3), (3, 3, 4), (4, 5, 2)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for f in range(5):  # None/Sub/Up/Average/Paeth
            got = decode_png(encode_png(img, filter_type=f))
            np.testing.assert_array_equal(got, img)

    rgb = rng.randint(0, 256, (12, 9, 3)).astype(np.uint8)
    gray = rng.randint(0, 256, (6, 6)).astype(np.uint8)
    tbl = pa.table(
        {
            "media_id": [1, 2],
            "payload": pa.array(
                [encode_png(rgb, filter_type=4), encode_pnm(gray)],
                type=pa.binary(),
            ),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(DecodeImage, batch_format="pyarrow", batch_size=1,
                     concurrency=1)
        .to_pandas()
        .sort_values("media_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, ["height", "width", "channels"]].tolist() == [12, 9, 3]
    assert out.loc[1, ["height", "width", "channels"]].tolist() == [6, 6, 1]
    assert abs(out.loc[0, "mean_intensity"] - rgb.mean()) < 1e-9

    # 16-bit is now decoded, so a depth-flipped 8-bit payload is LENGTH-
    # inconsistent — still raises (as corruption, not as a seam)
    bad = encode_png(rgb)
    bad = bad.replace(b"\x08\x02\x00\x00\x00", b"\x10\x02\x00\x00\x00", 1)
    with pytest.raises(UnsupportedMediaError):
        decode_png(bad)


def test_hmm_array_explode_majority_vote():
    """Array-source HMM mode (HmmProcessor.scala:134-140): elements explode
    into the window's sequence, one Viterbi run, per-row majority vote;
    empty arrays yield a null state (reference's explode + left join)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from arlas_proc_ray.stages.ml import (
        HmmModel,
        STILLMOVE_MODEL_JSON,
        with_hmm_states,
    )

    df = pd.DataFrame(
        {
            "id": ["a"] * 3 + ["b"] * 2,
            "seq": [1, 2, 3, 1, 2],
            "obs": [
                [1.0, 2.0, 3.0],
                [100.0, 90.0],
                [1.0, 95.0, 96.0],
                [],
                [5.0],
            ],
        }
    )
    out = (
        with_hmm_states(
            rd.from_pandas(df),
            keys=["id"],
            order_col="seq",
            obs_col="obs",
            model_json=STILLMOVE_MODEL_JSON,
            target="state",
            explode_arrays=True,
            num_partitions=2,
        )
        .to_pandas()
        .sort_values(["id", "seq"])
        .reset_index(drop=True)
    )

    # independent oracle: flatten per key, Viterbi the whole run, majority
    # vote per row (ties -> lowest state index)
    m = HmmModel.from_json(STILLMOVE_MODEL_JSON)
    for key, grp in df.groupby("id"):
        flat = (
            np.concatenate([np.asarray(v) for v in grp.obs if len(v)])
            if sum(map(len, grp.obs))
            else np.array([])
        )
        path = m.viterbi(m.quantize(flat)) if len(flat) else np.array([], np.int8)
        i, exp = 0, []
        for v in grp.obs:
            if len(v) == 0:
                exp.append(None)
                continue
            seg = path[i : i + len(v)]
            i += len(v)
            vals, cnt = np.unique(seg, return_counts=True)
            exp.append(m.states[vals[np.argmax(cnt)]])
        got = out[out.id == key]["state"].tolist()
        assert got == exp, (key, got, exp)
    assert out[(out.id == "b") & (out.seq == 1)]["state"].isna().all()


def test_with_tempo_window_cap_bounds_decode():
    """with_tempo decodes each key in <=window_size chunks (parity with
    HmmProcessor.scala:46); windows of one key decode independently."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from arlas_proc_ray.stages.ml import with_tempo

    n = 30
    df = pd.DataFrame(
        {
            "id": ["x"] * n,
            "seq": np.arange(n),
            "ts": np.cumsum(np.full(n, 100.0)),
        }
    )
    full = (
        with_tempo(rd.from_pandas(df), keys=["id"], order_col="seq", ts_col="ts",
                   num_partitions=2)
        .to_pandas().sort_values("seq")["tempo"].tolist()
    )
    capped = (
        with_tempo(rd.from_pandas(df), keys=["id"], order_col="seq", ts_col="ts",
                   num_partitions=2, window_size=7)
        .to_pandas().sort_values("seq")["tempo"].tolist()
    )
    # constant 100 s cadence: every window decodes to the same fast tempo,
    # so capping must not change the labels (and proves the cap code path)
    assert full == capped
    assert set(capped[1:]) == {"tempo_fast"} and capped[0] == "tempo_irregular"


def _png_chunks(*chunks: tuple[bytes, bytes]) -> bytes:
    """Assemble a PNG from (type, data) chunks with real CRCs."""
    import struct
    import zlib

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    for ctype, data in chunks:
        out += struct.pack(">I", len(data)) + ctype + data
        out += struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    return bytes(out)


def _ihdr(w, h, depth, color, interlace=0) -> bytes:
    import struct

    return struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)


def test_png_palette_decode():
    import zlib

    import numpy as np

    from arlas_proc_ray.multimodal.codecs import decode_png

    rng = np.random.default_rng(5)
    plte = rng.integers(0, 256, (5, 3), dtype=np.uint8)
    idx = rng.integers(0, 5, (3, 4), dtype=np.uint8)
    rows = b"".join(b"\x00" + idx[y].tobytes() for y in range(3))
    png = _png_chunks(
        (b"IHDR", _ihdr(4, 3, 8, 3)),
        (b"PLTE", plte.tobytes()),
        (b"IDAT", zlib.compress(rows)),
        (b"IEND", b""),
    )
    got = decode_png(png)
    assert got.shape == (3, 4, 3)
    assert (got == plte[idx]).all()

    # tRNS → RGBA (missing entries default opaque)
    trns = np.array([0, 128], dtype=np.uint8)
    png_a = _png_chunks(
        (b"IHDR", _ihdr(4, 3, 8, 3)),
        (b"PLTE", plte.tobytes()),
        (b"tRNS", trns.tobytes()),
        (b"IDAT", zlib.compress(rows)),
        (b"IEND", b""),
    )
    got_a = decode_png(png_a)
    assert got_a.shape == (3, 4, 4)
    want_alpha = np.array([0, 128, 255, 255, 255], dtype=np.uint8)[idx]
    assert (got_a[:, :, 3] == want_alpha).all()


def test_png_16bit_decode():
    import zlib

    import numpy as np

    from arlas_proc_ray.multimodal.codecs import decode_png

    rng = np.random.default_rng(9)
    img = rng.integers(0, 1 << 16, (4, 5), dtype=np.uint16)
    rows = b"".join(
        b"\x00" + img[y].astype(">u2").tobytes() for y in range(4)
    )
    png = _png_chunks(
        (b"IHDR", _ihdr(5, 4, 16, 0)),
        (b"IDAT", zlib.compress(rows)),
        (b"IEND", b""),
    )
    got = decode_png(png)
    assert got.dtype == np.uint16 and got.shape == (4, 5)
    assert (got == img).all()

    rgb = rng.integers(0, 1 << 16, (3, 2, 3), dtype=np.uint16)
    rows = b"".join(
        b"\x02" if False else b"\x00" + rgb[y].astype(">u2").tobytes()
        for y in range(3)
    )
    png = _png_chunks(
        (b"IHDR", _ihdr(2, 3, 16, 2)),
        (b"IDAT", zlib.compress(rows)),
        (b"IEND", b""),
    )
    got = decode_png(png)
    assert got.shape == (3, 2, 3) and (got == rgb).all()


def _interlace_adam7(img: np.ndarray, filters=(0,)) -> bytes:
    """Reference interlacer: split into the 7 passes, filter each row
    with a cycling filter type (None / Up supported here)."""
    import numpy as np

    ADAM7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    flat = img.reshape(h, w, ch)
    out = bytearray()
    fi = 0
    for x0, y0, dx, dy in ADAM7:
        sub = flat[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        prev = np.zeros(pw * ch, dtype=np.int64)
        for y in range(ph):
            row = sub[y].reshape(-1).astype(np.int64)
            f = filters[fi % len(filters)]
            fi += 1
            if f == 0:
                out += b"\x00" + row.astype(np.uint8).tobytes()
            elif f == 2:  # Up
                enc = (row - prev) & 0xFF
                out += b"\x02" + enc.astype(np.uint8).tobytes()
            prev = row
    return bytes(out)


def test_png_adam7_decode():
    import zlib

    import numpy as np

    from arlas_proc_ray.multimodal.codecs import decode_png

    rng = np.random.default_rng(13)
    for shape, color in [((9, 10, 3), 2), ((7, 5), 0), ((8, 8, 4), 6)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        h, w = shape[:2]
        for filters in [(0,), (0, 2), (2,)]:
            raw = _interlace_adam7(img, filters=filters)
            png = _png_chunks(
                (b"IHDR", _ihdr(w, h, 8, color, interlace=1)),
                (b"IDAT", zlib.compress(raw)),
                (b"IEND", b""),
            )
            got = decode_png(png)
            assert got.shape == img.shape
            assert (got == img).all(), (shape, filters)


def test_png_sub_byte_depths():
    """1/2/4-bit grayscale (scaled to 8-bit range) and 4-bit palette,
    both interlace modes, vs hand-packed rows."""
    import zlib

    import numpy as np

    from arlas_proc_ray.multimodal.codecs import decode_png

    def pack_bits(vals: np.ndarray, depth: int) -> bytes:
        """One row of sample values → MSB-first packed bytes."""
        bits = ((vals[:, None] >> np.arange(depth - 1, -1, -1)) & 1).reshape(-1)
        pad = (-len(bits)) % 8
        bits = np.concatenate([bits, np.zeros(pad, dtype=bits.dtype)])
        return np.packbits(bits.astype(np.uint8)).tobytes()

    rng = np.random.default_rng(21)
    for depth in (1, 2, 4):
        vals = rng.integers(0, 1 << depth, (5, 7), dtype=np.uint8)
        rows = b"".join(
            b"\x00" + pack_bits(vals[y], depth) for y in range(5)
        )
        png = _png_chunks(
            (b"IHDR", _ihdr(7, 5, depth, 0)),
            (b"IDAT", zlib.compress(rows)),
            (b"IEND", b""),
        )
        got = decode_png(png)
        scale = 255 // ((1 << depth) - 1)
        assert got.shape == (5, 7)
        assert (got == vals * scale).all(), depth

    # 4-bit palette
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (4, 5), dtype=np.uint8)
    rows = b"".join(b"\x00" + pack_bits(idx[y], 4) for y in range(4))
    png = _png_chunks(
        (b"IHDR", _ihdr(5, 4, 4, 3)),
        (b"PLTE", plte.tobytes()),
        (b"IDAT", zlib.compress(rows)),
        (b"IEND", b""),
    )
    got = decode_png(png)
    assert got.shape == (4, 5, 3)
    assert (got == plte[idx]).all()

    # 2-bit gray, Adam7: interlace by packing each pass's rows
    ADAM7 = (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    )
    vals = rng.integers(0, 4, (9, 10), dtype=np.uint8)
    out = bytearray()
    for x0, y0, dx, dy in ADAM7:
        sub = vals[y0::dy, x0::dx]
        if 0 in sub.shape:
            continue
        for y in range(sub.shape[0]):
            out += b"\x00" + pack_bits(sub[y], 2)
    png = _png_chunks(
        (b"IHDR", _ihdr(10, 9, 2, 0, interlace=1)),
        (b"IDAT", zlib.compress(bytes(out))),
        (b"IEND", b""),
    )
    got = decode_png(png)
    assert got.shape == (9, 10)
    assert (got == vals * (255 // 3)).all()


def _gradient_rgb(h=48, w=64):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        xx * 255 // (w - 1),
        yy * 255 // (h - 1),
        (xx + yy) * 255 // (w + h - 2),
    ], axis=-1).astype(np.uint8)


def test_jpeg_tail_refill_wide_magnitude():
    """Sequential AC magnitude read at an entropy-segment tail: a 16-bit
    AC Huffman code can leave nbits=0 with s=10 still to read, so the
    refill must LOOP (two bytes), not top up once. The crafted stream —
    DC csize-5 (+17, consumes exactly 8 bits) then AC (0,10) v=+512 —
    put the round-4 single-byte `if` refill at `buf >> -2`
    (ValueError: negative shift count). Also sweeps encoder-produced
    quality-100 images whose last block carries a csize-10 coefficient
    through full decode for every byte alignment."""
    from arlas_proc_ray.multimodal import jpeg as J

    dct = J._huff_encode_table(J.DC_LUMA_BITS, J.DC_LUMA_VALS)
    act = J._huff_encode_table(J.AC_LUMA_BITS, J.AC_LUMA_VALS)
    bw = J._BitWriter()
    code, ln = dct[5]
    bw.write(code, ln)
    bw.write(17, 5)  # DC diff +17: 3-bit code + 5 raw bits = 8 bits
    code, ln = act[0x0A]
    assert ln == 16  # (run=0, size=10) is a 16-bit code in Annex K luma
    bw.write(code, ln)
    bw.write(512, 10)  # magnitude straddles the tail refill
    code, ln = act[0x00]
    bw.write(code, ln)  # EOB
    bw.flush()
    data = bytes(bw.out).replace(b"\xff\x00", b"\xff")  # destuffed form

    coefs = np.zeros(64, np.int64)
    J._block_sequential(
        (0, 0, 0), data, len(data), coefs,
        J._HuffDecoder(J.DC_LUMA_BITS, J.DC_LUMA_VALS),
        J._HuffDecoder(J.AC_LUMA_BITS, J.AC_LUMA_VALS), [0], 0,
    )
    assert coefs[0] == 17 and coefs[1] == 512
    assert int(np.abs(coefs[2:]).sum()) == 0

    # end-to-end: high-contrast (0,1)-cosine-sign block as the LAST block
    j = np.arange(8)
    row = np.where(np.cos((2 * j + 1) * np.pi / 16) > 0, 255, 1)
    blk = np.tile(row.astype(np.uint8), (8, 1))
    for k in range(1, 9):  # leading uniform blocks shift bit alignment
        img = np.full((8, 8 * k), 128, np.uint8)
        img[:, -8:] = blk
        out = J.decode_jpeg(J.encode_jpeg(img, quality=100))
        assert int(np.abs(out.astype(int) - img.astype(int)).max()) <= 2


def test_jpeg_roundtrip_444_and_420():
    """Baseline JPEG (multimodal/jpeg.py): encode→decode roundtrips
    within quantization error for 4:4:4 and 4:2:0 layouts; a uniform
    image is bit-exact (DC-only); restart markers decode identically."""
    from arlas_proc_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

    img = _gradient_rgb()
    out = decode_jpeg(encode_jpeg(img, quality=92))
    assert out.shape == img.shape
    assert np.abs(out.astype(float) - img).mean() < 2.0

    sub = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert sub.shape == img.shape
    assert np.abs(sub.astype(float) - img).mean() < 4.0

    # restart markers: byte-different stream, identical pixels
    rst = decode_jpeg(
        encode_jpeg(img, quality=92, restart_interval=3)
    )
    np.testing.assert_array_equal(rst, out)

    uniform = np.full((16, 24, 3), 130, np.uint8)
    exact = decode_jpeg(encode_jpeg(uniform, quality=85))
    assert int(np.abs(exact.astype(int) - 130).max()) == 0


def test_jpeg_gray_odd_dims_and_rejections():
    from arlas_proc_ray.multimodal.codecs import (
        UnsupportedMediaError,
        decode_image,
    )
    from arlas_proc_ray.multimodal.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:37, 0:53]  # non-multiple-of-8/16 dims
    g = ((xx * 3 + yy * 2) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=90))
    assert out.shape == g.shape
    assert np.abs(out.astype(float) - g).mean() < 12.0

    rgb = _gradient_rgb(37, 53)
    out = decode_jpeg(encode_jpeg(rgb, quality=90, subsample=True))
    assert out.shape == rgb.shape

    # decode_image dispatches on the SOI magic
    assert decode_image(encode_jpeg(g, quality=90)).shape == g.shape

    # lossless/arithmetic SOFs stay out of scope
    payload = bytearray(encode_jpeg(g))
    i = payload.index(b"\xff\xc0")
    payload[i + 1] = 0xC3
    with pytest.raises(UnsupportedMediaError, match="out of scope"):
        decode_jpeg(bytes(payload))
    with pytest.raises(UnsupportedMediaError, match="SOI"):
        decode_jpeg(b"\x89PNG not a jpeg")


def test_jpeg_feeds_decode_image_stage(ray_session):
    """DecodeImage actor stage consumes JPEG payloads end to end."""
    import ray.data as rd

    from arlas_proc_ray.multimodal.codecs import DecodeImage
    from arlas_proc_ray.multimodal.jpeg import encode_jpeg

    imgs = [_gradient_rgb(24, 32), _gradient_rgb(16, 16)]
    t = pa.table({
        "media_id": pa.array([0, 1], pa.int64()),
        "payload": pa.array(
            [encode_jpeg(i, quality=90) for i in imgs], pa.binary()
        ),
    })
    out = (
        rd.from_arrow(t)
        .map_batches(DecodeImage, batch_format="pyarrow", concurrency=1,
                     batch_size=None)
        .to_pandas()
        .sort_values("media_id")
    )
    assert list(out["height"]) == [24, 16]
    assert list(out["width"]) == [32, 16]
    assert list(out["channels"]) == [3, 3]
    assert all(len(th) == 8 * 8 * 3 for th in out["thumb"])


def test_jpeg_progressive_matches_baseline():
    """Progressive decode (SOF2: spectral selection + successive
    approximation — DC Al=1→0, AC first pass Al=1 then refinement)
    reconstructs the EXACT same pixels as the baseline path at the same
    quality: the quantized coefficients are identical, only the scan
    script differs. Noisy input stresses ZRL, EOB runs and the two
    correction-bit buffers; flat input stresses long EOB runs."""
    from arlas_proc_ray.multimodal.codecs import decode_image
    from arlas_proc_ray.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(3)
    cases = [
        (_gradient_rgb(), 88),
        (rng.integers(0, 256, (40, 56, 3), dtype=np.uint8), 70),
        (np.zeros((24, 24, 3), np.uint8), 85),
    ]
    for img, q in cases:
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        np.testing.assert_array_equal(prog, base)
    # grayscale, via the dispatching entry point
    yy, xx = np.mgrid[0:37, 0:53]
    g = ((xx * yy) % 256).astype(np.uint8)
    np.testing.assert_array_equal(
        decode_image(encode_jpeg_progressive(g, quality=80)),
        decode_jpeg(encode_jpeg(g, quality=80)),
    )


def test_mjpeg_avi_roundtrip_and_pruned_decode():
    """VERDICT r4 #8 (video seam): MJPEG-in-AVI mux/demux on the
    from-scratch JPEG codec. Round-trip pixels within JPEG tolerance,
    container metadata (fps, frame count) exact, demux yields raw JPEG
    payloads without entropy decode, frame_indices prunes the decode,
    and non-AVI / non-MJPG payloads fail loudly."""
    import pytest

    from arlas_proc_ray.multimodal.codecs import UnsupportedMediaError
    from arlas_proc_ray.multimodal.video import (
        avi_frame_rate,
        decode_avi_mjpeg,
        encode_avi_mjpeg,
        iter_frame_payloads,
    )

    frames = []
    for i in range(7):
        f = np.zeros((24, 32, 3), np.uint8)
        f[:, :, 0] = 30 * i
        f[4:12, 8:16, 1] = 220
        f[16:, :, 2] = 90
        frames.append(f)
    avi = encode_avi_mjpeg(frames, fps=5, quality=95)

    assert avi_frame_rate(avi) == 5.0
    payloads = list(iter_frame_payloads(avi))
    assert len(payloads) == 7
    assert all(p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9" for p in payloads)

    dec = decode_avi_mjpeg(avi)
    assert len(dec) == 7 and dec[0].shape == (24, 32, 3)
    for d, f in zip(dec, frames):
        assert float(np.abs(d.astype(int) - f.astype(int)).mean()) < 2.0

    sub = decode_avi_mjpeg(avi, frame_indices=[1, 4, 6])
    assert len(sub) == 3
    np.testing.assert_array_equal(sub[0], dec[1])
    np.testing.assert_array_equal(sub[2], dec[6])

    # grayscale frames round-trip too
    g = [np.full((16, 16), 40 * i, np.uint8) for i in range(3)]
    gdec = decode_avi_mjpeg(encode_avi_mjpeg(g, fps=2, quality=90))
    assert gdec[0].shape == (16, 16)

    with pytest.raises(UnsupportedMediaError):
        decode_avi_mjpeg(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(UnsupportedMediaError):
        decode_avi_mjpeg(b"\x89PNG not a container")
    with pytest.raises(ValueError):
        encode_avi_mjpeg([])


def test_sample_video_frames_stage(ray_session):
    """The actor-pool video stage: one row per sampled frame, shared
    output layout with DecodeImage (+frame_index), decode pruned to the
    plan — exercised through a real map_batches actor pool."""
    import ray.data as rd

    from arlas_proc_ray.multimodal.binary import (
        SampleVideoFrames,
        frame_sample_plan,
    )
    from arlas_proc_ray.multimodal.video import encode_avi_mjpeg

    def vid(n, seed):
        rng = np.random.default_rng(seed)
        return encode_avi_mjpeg(
            [np.full((16, 16, 3), int(rng.integers(0, 200)), np.uint8)
             for _ in range(n)],
            fps=4, quality=92,
        )

    tbl = pa.table(
        {
            "doc_id": pa.array(["a", "b"], pa.string()),
            "payload": pa.array([vid(10, 1), vid(6, 2)], pa.binary()),
        }
    )
    out = (
        rd.from_arrow(tbl)
        .map_batches(
            SampleVideoFrames(every_s=1.0, target_size=(4, 4)),
            batch_format="pyarrow",
            batch_size=1,
            concurrency=2,
        )
        .to_pandas()
        .sort_values(["doc_id", "frame_index"])
        .reset_index(drop=True)
    )
    # 10 frames @4fps = 2.5 s → samples at t=0,1,2 → frames 0,4,8
    want_a = frame_sample_plan(10 / 4, 4, 1.0).tolist()
    want_b = frame_sample_plan(6 / 4, 4, 1.0).tolist()
    assert out[out["doc_id"] == "a"]["frame_index"].tolist() == want_a
    assert out[out["doc_id"] == "b"]["frame_index"].tolist() == want_b
    assert (out["height"] == 16).all() and (out["channels"] == 3).all()
    assert all(len(t) == 4 * 4 * 3 for t in out["thumb"])


def test_windowed_audio_features_vectorized_matches_per_window_oracle():
    from arlas_proc_ray.multimodal.codecs import (
        audio_features,
        decode_wav,
        encode_wav,
        window_audio_features,
    )

    rate = 8000
    t = np.arange(rate * 2) / rate  # 2 s clip
    sig = np.concatenate(
        [
            (0.5 * np.sin(2 * np.pi * 440 * t[: rate // 2])),  # tone
            np.zeros(rate // 2),                                # silence
            (0.25 * np.sin(2 * np.pi * 880 * t[rate:])),        # quieter
        ]
    ).astype(np.float32)
    samples, r2 = decode_wav(encode_wav(sig, rate))
    assert r2 == rate

    w = window_audio_features(samples, rate, window_s=0.25)
    assert len(w) == len(samples) // (rate // 4)
    # per-window oracle via the whole-clip kernel on each slice
    win = rate // 4
    for i in range(len(w)):
        seg = samples[i * win:(i + 1) * win]
        f = audio_features(seg, rate)
        assert abs(w["rms"].iloc[i] - f["rms"]) < 1e-12
        assert (
            abs(w["zero_crossing_rate"].iloc[i] - f["zero_crossing_rate"])
            < 1e-12
        )
        assert w["peak"].iloc[i] == np.abs(seg.astype(np.float64)).max()
    # the silent middle windows are exactly zero; tone windows are not
    mid = w[(w["t0_s"] >= 0.5) & (w["t0_s"] < 1.0)]
    assert (mid["rms"] == 0.0).all() and (mid["peak"] == 0.0).all()
    assert (w[w["t0_s"] < 0.5]["rms"] > 0.3).all()
    # overlap: hop = half window doubles (minus edge) the row count
    w2 = window_audio_features(samples, rate, window_s=0.25, hop_s=0.125)
    assert len(w2) == 2 * len(w) - 1


def test_windowed_audio_stage_explodes_and_skips_nulls(ray_session):
    from arlas_proc_ray.multimodal.codecs import (
        WindowedAudioFeatures,
        encode_wav,
    )

    rate = 4000
    clip = (0.5 * np.sin(np.arange(rate) * 0.3)).astype(np.float32)  # 1 s
    short = clip[: rate // 10]  # 0.1 s < one 0.5 s window -> zero rows
    pdf = pd.DataFrame(
        {
            "media_id": [1, 2, 3],
            "payload": [encode_wav(clip, rate), None,
                        encode_wav(short, rate)],
        }
    )
    out = (
        rd.from_pandas(pdf)
        .map_batches(
            WindowedAudioFeatures("payload", window_s=0.5),
            batch_format="pyarrow", batch_size=None,
            concurrency=1,
        )
        .to_pandas()
    )
    assert set(out["media_id"]) == {1}
    assert len(out) == 2 and list(out["window_idx"]) == [0, 1]
    assert (out["sample_rate"] == rate).all()
    assert "payload" not in out.columns
