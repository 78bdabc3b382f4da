"""Real image decode (operators/multimodal.py::decode_images): pure
numpy BMP/PPM parsing inside the Arrow kernel — roundtrip pixel
equality, format-signature rejection for compressed formats, and the
end-to-end binaryFile -> payload -> pixels -> stats path with planted
fixture bytes (VERDICT r5 #5)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tfm_semisup_spark.operators.multimodal import (
    decode_payload,
    encode_bmp,
    encode_ppm,
)


def _pixels(h: int, w: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_bmp_roundtrip_exact_pixels_with_row_padding():
    # width 5 -> 15-byte rows padded to 16: the 4-byte-stride branch
    arr = _pixels(3, 5, seed=1)
    fmt, out = decode_payload(encode_bmp(arr))
    assert fmt == "bmp"
    np.testing.assert_array_equal(out, arr)


def test_bmp_roundtrip_aligned_width():
    arr = _pixels(4, 8, seed=2)  # 24-byte rows, no padding
    fmt, out = decode_payload(encode_bmp(arr))
    assert fmt == "bmp"
    np.testing.assert_array_equal(out, arr)


def test_bmp_top_down_negative_height():
    # hand-flip an encoded BMP into top-down form: negate the height
    # field and reverse the stored row order; decode must agree
    arr = _pixels(3, 4, seed=3)
    data = bytearray(encode_bmp(arr))
    (h,) = struct.unpack_from("<i", data, 22)
    struct.pack_into("<i", data, 22, -h)
    stride = (4 * 3 + 3) // 4 * 4
    rows = [bytes(data[54 + y * stride : 54 + (y + 1) * stride]) for y in range(h)]
    data[54:] = b"".join(reversed(rows))
    fmt, out = decode_payload(bytes(data))
    assert fmt == "bmp"
    np.testing.assert_array_equal(out, arr)


def test_ppm_roundtrip_and_comment_header():
    arr = _pixels(2, 3, seed=4)
    fmt, out = decode_payload(encode_ppm(arr))
    assert fmt == "ppm"
    np.testing.assert_array_equal(out, arr)
    # comments between header tokens are legal PPM
    commented = b"P6\n# planted comment\n3 2\n# another\n255\n" + arr.tobytes()
    fmt2, out2 = decode_payload(commented)
    assert fmt2 == "ppm"
    np.testing.assert_array_equal(out2, arr)


@pytest.mark.parametrize(
    "payload",
    [
        b"\x89PNG\r\n\x1a\n" + b"\x00" * 32,
        b"\xff\xd8\xff\xe0" + b"\x00" * 32,
        b"GIF89a" + b"\x00" * 32,
        b"RIFF\x00\x00\x00\x00WEBP",
        b"????" + b"\x00" * 32,  # unknown signature
    ],
)
def test_compressed_or_unknown_signatures_raise(payload):
    with pytest.raises(NotImplementedError):
        decode_payload(payload)


def test_bmp_8bit_raises():
    # patch bpp to 8 in a valid header: unsupported depth must be loud
    data = bytearray(encode_bmp(_pixels(2, 2)))
    struct.pack_into("<H", data, 28, 8)
    with pytest.raises(NotImplementedError):
        decode_payload(bytes(data))


def test_wav_roundtrip_mono_and_stereo():
    from tfm_semisup_spark.operators.multimodal import decode_wav, encode_wav

    mono = (np.arange(100, dtype=np.int16) - 50) * 100
    rate, out = decode_wav(encode_wav(mono, sample_rate=8000))
    assert rate == 8000
    np.testing.assert_array_equal(out[:, 0], mono)
    stereo = np.stack([mono, -mono], axis=1)
    rate2, out2 = decode_wav(encode_wav(stereo, sample_rate=44100))
    assert rate2 == 44100
    assert out2.shape == (100, 2)
    np.testing.assert_array_equal(out2, stereo)


def test_wav_skips_extra_chunks_with_word_alignment():
    """Chunk walking must skip unknown chunks (LIST etc.) and honor the
    RIFF word-alignment pad byte on odd-length chunks."""
    from tfm_semisup_spark.operators.multimodal import decode_wav, encode_wav

    mono = np.array([1, -2, 3], dtype=np.int16)
    data = encode_wav(mono, sample_rate=16000)
    # splice an odd-length junk chunk (5 bytes + 1 pad) after "WAVE"
    junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    patched = data[:12] + junk + data[12:]
    rate, out = decode_wav(patched)
    assert rate == 16000
    np.testing.assert_array_equal(out[:, 0], mono)


def test_wav_rejects_non_pcm_and_non_riff():
    from tfm_semisup_spark.operators.multimodal import decode_wav, encode_wav

    with pytest.raises(NotImplementedError):
        decode_wav(b"ID3\x03" + b"\x00" * 40)  # mp3-ish
    data = bytearray(encode_wav(np.array([0, 1], dtype=np.int16)))
    struct.pack_into("<H", data, 20 + 14, 8)  # bits-per-sample -> 8
    with pytest.raises(NotImplementedError):
        decode_wav(bytes(data))


def test_binaryfile_to_pixel_stats_end_to_end(spark, tmp_path):
    """binaryFile source -> decode_images -> per-channel means, with
    planted bytes whose means are known in closed form."""
    from pyspark.sql import functions as F

    from tfm_semisup_spark.operators.multimodal import decode_images
    from tfm_semisup_spark.sources import read_binary_files

    media = tmp_path / "media"
    media.mkdir()
    flat = np.zeros((2, 2, 3), dtype=np.uint8)
    flat[:, :, 0] = 10  # mean_r = 10
    flat[:, :, 1] = 20
    flat[:, :, 2] = 40
    (media / "img0.bmp").write_bytes(encode_bmp(flat))
    grad = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    (media / "img1.ppm").write_bytes(encode_ppm(grad))
    (media / "notes.txt").write_text("not an image")

    files = read_binary_files(spark, str(media), glob="img*.*")
    payloads = files.select(
        F.regexp_extract(F.col("path"), r"img(\d+)\.", 1).cast("long").alias("doc_id"),
        F.col("content").alias("payload"),
    )
    rows = {r["doc_id"]: r for r in decode_images(payloads).collect()}
    assert set(rows) == {0, 1}
    assert (rows[0]["format"], rows[0]["width"], rows[0]["height"]) == ("bmp", 2, 2)
    assert (rows[0]["mean_r"], rows[0]["mean_g"], rows[0]["mean_b"]) == (10.0, 20.0, 40.0)
    assert (rows[1]["format"], rows[1]["width"], rows[1]["height"]) == ("ppm", 3, 2)
    expected = grad.reshape(-1, 3).mean(axis=0)
    assert rows[1]["mean_r"] == pytest.approx(expected[0])
    assert rows[1]["mean_g"] == pytest.approx(expected[1])
    assert rows[1]["mean_b"] == pytest.approx(expected[2])


def test_resize_nearest_matches_reference():
    """NN resize must pick exactly pixel (floor(x*w/tw), floor(y*h/th))
    for every output cell, including non-divisible dims."""
    import numpy as np

    from tfm_semisup_spark.operators.multimodal import resize_nearest

    rng = np.random.default_rng(7)
    for (h, w, tw, th) in [(3, 4, 3, 2), (6, 8, 3, 2), (5, 7, 4, 3), (2, 2, 3, 2)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = resize_nearest(img, tw, th)
        assert out.shape == (th, tw, 3)
        for y in range(th):
            for x in range(tw):
                assert (out[y, x] == img[(y * h) // th, (x * w) // tw]).all()


def test_decode_resize_roundtrip_both_formats(spark):
    """Encode planted pixels as BMP and PPM, decode+resize via the
    Arrow kernel, compare thumbnail means against pure numpy."""
    import numpy as np

    from tfm_semisup_spark.operators.multimodal import (
        decode_resize_images,
        encode_bmp,
        encode_ppm,
        resize_nearest,
    )

    rng = np.random.default_rng(11)
    imgs = {1: rng.integers(0, 256, (5, 6, 3), dtype=np.uint8),
            2: rng.integers(0, 256, (4, 9, 3), dtype=np.uint8)}
    rows = [(1, bytearray(encode_ppm(imgs[1]))), (2, bytearray(encode_bmp(imgs[2])))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_resize_images(df, 3, 2).collect()}
    for doc_id, img in imgs.items():
        want = resize_nearest(img, 3, 2).reshape(-1, 3).mean(axis=0)
        r = got[doc_id]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert abs(r["tmean_r"] - want[0]) < 1e-9
        assert abs(r["tmean_g"] - want[1]) < 1e-9
        assert abs(r["tmean_b"] - want[2]) < 1e-9


def test_rawv_roundtrip_and_frame_payloads():
    from tfm_semisup_spark.operators.multimodal import (
        decode_payload,
        decode_video_rawv,
        encode_bmp,
        encode_video_rawv,
    )

    frames = [encode_bmp(_pixels(3, 4, seed=f)) for f in range(5)]
    container = encode_video_rawv(frames)
    back = decode_video_rawv(container)
    assert back == frames
    # sampled frames decode to the exact planted pixels
    for f in (0, 3):
        fmt, img = decode_payload(back[f])
        assert fmt == "bmp"
        np.testing.assert_array_equal(img, _pixels(3, 4, seed=f))


def test_compressed_video_signatures_raise():
    import pytest

    from tfm_semisup_spark.operators.multimodal import decode_video_rawv

    # MP4 (ftyp box), AVI/RIFF, Matroska/WebM EBML
    for payload in (
        b"\x00\x00\x00\x18ftypmp42" + b"\x00" * 16,
        b"RIFF\x24\x00\x00\x00AVI LIST" + b"\x00" * 16,
        b"\x1a\x45\xdf\xa3" + b"\x00" * 16,
    ):
        with pytest.raises(NotImplementedError):
            decode_video_rawv(payload)


def test_frame_audio_rms_empty_when_too_short():
    from tfm_semisup_spark.operators.multimodal import decode_wav, encode_wav

    # clip shorter than one frame decodes fine; the framing kernel's
    # n_frames formula would yield 0 rows for it
    wav = encode_wav(np.arange(10, dtype=np.int16), sample_rate=8000)
    rate, arr = decode_wav(wav)
    assert rate == 8000 and arr.shape == (10, 1)
    assert max(0, (len(arr) - 16) // 8 + 1) == 0
