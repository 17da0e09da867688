"""Apps layer: audio capture backends, subtitle exporters, synced-player prep."""

import os
import sys

import numpy as np
import pytest

from chunkformer_tpu.data.capture import (FileSimulator, _QueueCapture,
                                          open_capture)
from chunkformer_tpu.decode.outputs import (format_timestamp, parse_timestamp,
                                            segments_to_srt, segments_to_vtt)

SAMPLES = "/root/reference/samples/audios"


def test_timestamp_roundtrip():
    for s in (0.0, 0.08, 61.44, 3725.123):
        assert abs(parse_timestamp(format_timestamp(s)) - s) < 1e-3


SEGS = [{"decode": "hello world", "start": "00:00:01:000", "end": "00:00:02:500"},
        {"decode": "again", "start": "00:00:03:000", "end": "00:00:04:000"}]


def test_srt_vtt_exporters():
    srt = segments_to_srt(SEGS)
    assert "1\n00:00:01,000 --> 00:00:02,500\nhello world" in srt
    assert "2\n00:00:03,000 --> 00:00:04,000\nagain" in srt
    vtt = segments_to_vtt(SEGS)
    assert vtt.startswith("WEBVTT")
    assert "00:00:01.000 --> 00:00:02.500\nhello world" in vtt


def test_prepare_segments_for_player():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "apps", "streamlit"))
    from ui_components import guess_mime, prepare_segments_for_player

    segs = SEGS + [{"decode": "  ", "start": "00:00:05:000", "end": "00:00:06:000"},
                   # overlapping start is clamped to the previous end
                   {"decode": "x", "start": "00:00:03:500", "end": "00:00:05:000"}]
    out = prepare_segments_for_player(segs)
    assert [p["text"] for p in out] == ["hello world", "again", "x"]
    assert out[0]["start"] == 1.0 and out[0]["end"] == 2.5
    assert out[2]["start"] == 4.0  # clamped to prev end, not 3.5
    assert guess_mime("a.mp4") == "video/mp4"
    assert guess_mime("a.WAV") == "audio/wav"


def test_queue_capture_push_and_drop():
    cap = _QueueCapture(chunk_samples=100, max_buffer_chunks=2)
    cap._running = True
    cap._push(np.arange(250, dtype=np.float32))
    assert cap.buffered_chunks() == 2          # 2 full chunks, 50 pending
    # 150 more samples -> two more chunks -> the two oldest get dropped
    cap._push(np.arange(150, dtype=np.float32))
    assert cap.buffered_chunks() == 2
    assert cap.dropped_chunks == 2
    first = cap.read_chunk(timeout=0.1)
    expected = np.concatenate([np.arange(200, 250), np.arange(0, 50)]).astype(np.float32)
    np.testing.assert_array_equal(first, expected)


@pytest.mark.skipif(not os.path.isdir(SAMPLES), reason="samples not mounted")
def test_file_simulator_stream():
    wav_path = os.path.join(SAMPLES, "audio_1.wav")
    with open_capture(wav_path, chunk_samples=16000, speed=0.0) as cap:
        chunks = list(cap)
    assert chunks, "no chunks produced"
    total = sum(len(c) for c in chunks)
    assert all(len(c) == 16000 for c in chunks[:-1])
    assert cap.audio_seconds == pytest.approx(total / 16000, rel=1e-3)


def test_open_capture_mic_without_backend():
    # neither sounddevice nor pyaudio is installed in this environment
    with pytest.raises((RuntimeError, Exception)):
        cap = open_capture("mic")
        cap.start()


def _app_path():
    p = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "apps", "streamlit")
    if p not in sys.path:
        sys.path.insert(0, p)
    return p


def test_app_utils_timestamps_and_stats():
    _app_path()
    from utils import (format_timestamp, get_transcript_at_time,
                       plain_transcript, timestamp_to_seconds,
                       transcript_stats)

    assert timestamp_to_seconds("00:01:02:500") == pytest.approx(62.5)
    assert format_timestamp(62.5) == "00:01:02:500"
    assert format_timestamp(timestamp_to_seconds("01:02:03:004")) == "01:02:03:004"

    seg = get_transcript_at_time(SEGS, 1.5)
    assert seg is not None and seg["decode"] == "hello world"
    assert get_transcript_at_time(SEGS, 2.7) is None
    stats = transcript_stats(SEGS)
    assert stats == {"segments": 2, "words": 3, "speech_end": 4.0}
    assert plain_transcript(SEGS, with_times=False) == "hello world again"
    assert "[00:00:01:000 - 00:00:02:500]" in plain_transcript(SEGS)


def test_app_config_and_subtitles():
    _app_path()
    from config import APP_CONFIG
    from utils import create_subtitle_srt, create_subtitle_vtt

    assert "wav" in APP_CONFIG.supported_formats
    assert APP_CONFIG.chunk_size == 64
    assert create_subtitle_srt(SEGS).startswith("1\n")
    assert create_subtitle_vtt(SEGS).startswith("WEBVTT")


def test_app_audio_processing_save_with_progress(tmp_path):
    _app_path()
    import io

    from audio_processing import (probe_duration_seconds,
                                  save_uploaded_file_with_progress)

    class FakeUpload(io.BytesIO):
        name = "clip.wav"
        size = 300

    data = os.urandom(300)
    seen = []
    path, n = save_uploaded_file_with_progress(FakeUpload(data),
                                               progress_cb=seen.append)
    try:
        assert n == 300
        assert open(path, "rb").read() == data
        assert seen and seen[-1] == 1.0
        assert path.endswith(".wav")
    finally:
        os.unlink(path)

    # wav probe
    import wave

    wav = tmp_path / "t.wav"
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(b"\0\0" * 8000)
    assert probe_duration_seconds(str(wav)) == pytest.approx(0.5)


def test_app_chrome_renders_without_streamlit():
    """The chrome helpers import cleanly; rendering requires streamlit (not
    installed here), so only the pure pieces are exercised."""
    _app_path()
    import ui_components

    assert "cf-hero" in ui_components.CUSTOM_CSS
    html_doc = ui_components._player_html("QUJD", "audio/wav", "[]", 400)
    assert "<audio" in html_doc and "timeupdate" in html_doc
