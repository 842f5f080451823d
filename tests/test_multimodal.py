"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
deterministic fake decoders, frame explosion, JVM-side header parsing.
(Real codecs are stubbed behind import-try — absent in this container.)"""

from __future__ import annotations

import numpy as np
import pytest

from fscrawler_spark.functions import multimodal as MM


@pytest.fixture(scope="module")
def media_df(spark):
    rows = []
    for i in range(12):
        rows.append(
            (i, f"http://m.example/img{i}.png", "image",
             MM.encode_fake_image(8 + i, 6, 3, seed=i), {"src": "gen"})
        )
    for i in range(12, 18):
        rows.append(
            (i, f"http://m.example/a{i}.wav", "audio",
             MM.encode_fake_audio(16000, 8000 * (i - 11), seed=i), {})
        )
    for i in range(18, 22):
        rows.append(
            (i, f"http://m.example/v{i}.mp4", "video",
             MM.encode_fake_video(7, 4, 3, seed=i), {})
        )
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA).repartition(4)


def test_image_info(media_df):
    got = {r["media_id"]: r for r in MM.image_info(media_df).collect()}
    assert len(got) == 12
    for i in range(12):
        r = got[i]
        assert (r["width"], r["height"], r["channels"]) == (8 + i, 6, 3)
        assert r["n_bytes"] == 19 + (8 + i) * 6 * 3
        # px_sum must equal an independent numpy sum over the raw payload
        blob = MM.encode_fake_image(8 + i, 6, 3, seed=i)
        assert r["px_sum"] == int(
            np.frombuffer(blob[19:], dtype=np.uint8).sum()
        )


def test_image_features_deterministic_and_normed(media_df):
    a = {r["media_id"]: r["features"] for r in MM.image_features(media_df, dim=16).collect()}
    b = {r["media_id"]: r["features"] for r in MM.image_features(media_df, dim=16).collect()}
    assert a == b  # deterministic across runs/partitionings
    for v in a.values():
        assert len(v) == 16
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5


def test_frame_sampling_explodes(media_df):
    rows = MM.sample_frames(media_df, every_n=2).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    assert set(by_id) == {18, 19, 20, 21}
    for vid, frames in by_id.items():
        assert [f["frame_idx"] for f in sorted(frames, key=lambda x: x["frame_idx"])] == [0, 2, 4, 6]
        assert all(len(f["frame"]) == 12 for f in frames)  # 4x3 bytes


def test_audio_duration_jvm_side(media_df):
    got = {r["media_id"]: r for r in MM.audio_duration(media_df).collect()}
    assert len(got) == 6
    for i in range(12, 18):
        r = got[i]
        assert r["sample_rate"] == 16000
        assert r["n_samples"] == 8000 * (i - 11)
        assert r["duration_sec"] == round(r["n_samples"] / 16000, 6)


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        MM.decode_image_py(b"\x89PNG\r\n\x1a\n....")  # real format -> stub
    assert MM.decode_image_py(None) is None


def test_audio_features_windows(spark):
    """Windowed RMS/ZCR over the fake PCM: values must match an
    independent numpy computation on the same payload."""
    import numpy as np

    from fscrawler_spark.functions import multimodal as MM

    blob = MM.encode_fake_audio(8000, 1600, seed=5)
    media = spark.createDataFrame(
        [(1, "u", "audio", blob, {})], MM.MEDIA_SCHEMA
    )
    rows = {
        r["window"]: (r["rms"], r["zcr"])
        for r in MM.audio_features(media, n_windows=4).collect()
    }
    assert sorted(rows) == [0, 1, 2, 3]
    pcm = np.frombuffer(blob[15:], dtype=np.uint8).astype(np.float64) - 128.0
    for w, chunk in enumerate(np.array_split(pcm, 4)):
        rms = float(np.sqrt((chunk**2).mean()))
        signs = np.sign(chunk)
        nz = signs != 0
        zcr = int((np.diff(signs[nz]) != 0).sum()) / max(1, len(chunk) - 1)
        assert abs(rows[w][0] - rms) < 1e-12, w
        assert abs(rows[w][1] - zcr) < 1e-12, w
