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
