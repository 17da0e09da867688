"""Streamlit long-form transcription UI (reference: apps/streamlit/app.py).

Upload audio/video, transcribe with endless_decode, and browse the
timestamped transcript with search. Run:

    streamlit run apps/streamlit/app.py -- --model_checkpoint /path/to/model
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))


def main():
    try:
        import streamlit as st
    except ImportError:
        print("streamlit is not installed; `pip install streamlit` to run this app",
              file=sys.stderr)
        return 2

    parser = argparse.ArgumentParser()
    parser.add_argument("--model_checkpoint", default=os.environ.get("CHUNKFORMER_MODEL"))
    args, _ = parser.parse_known_args()

    st.set_page_config(page_title="ChunkFormer-TPU transcription", layout="wide")
    st.title("ChunkFormer-TPU long-form transcription")

    with st.sidebar:
        model_dir = st.text_input("Model directory", args.model_checkpoint or "")
        chunk_size = st.number_input("Chunk size", value=64, min_value=1)
        left_ctx = st.number_input("Left context", value=128, min_value=0)
        right_ctx = st.number_input("Right context", value=128, min_value=0)
        budget = st.number_input("Batch duration (s)", value=1800, min_value=60)
        max_silence = st.slider("Segment silence gap (s)", 0.1, 2.0, 0.5)

    @st.cache_resource
    def load_model(path):
        from chunkformer_tpu.api import ChunkFormerModel

        return ChunkFormerModel.from_pretrained(path)

    upload = st.file_uploader("Audio / video file",
                              type=["wav", "mp3", "flac", "mp4", "m4a", "ogg",
                                    "webm", "mov"])
    if upload and model_dir:
        from ui_components import guess_mime, render_synchronized_player

        from chunkformer_tpu.decode.outputs import segments_to_srt, segments_to_vtt

        model = load_model(model_dir)
        suffix = os.path.splitext(upload.name)[1]
        media_bytes = upload.read()
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
            f.write(media_bytes)
            path = f.name
        try:
            t0 = time.perf_counter()
            with st.spinner("Transcribing..."):
                segments = model.endless_decode(
                    path, chunk_size=int(chunk_size), left_context_size=int(left_ctx),
                    right_context_size=int(right_ctx), total_batch_duration=int(budget),
                    return_timestamps=True, max_silence_duration=float(max_silence))
            elapsed = time.perf_counter() - t0
            st.success(f"Done in {elapsed:.1f}s — {len(segments)} segments")

            # media player with subtitles synchronized to playback
            render_synchronized_player(media_bytes, guess_mime(upload.name),
                                       segments)

            query = st.text_input("Search transcript")
            if query:
                for seg in segments:
                    text = seg["decode"]
                    if query.lower() in text.lower():
                        st.markdown(f"**{seg['start']} → {seg['end']}**  {text}")

            col1, col2, col3 = st.columns(3)
            col1.download_button(
                "Transcript (.txt)",
                "\n".join(f"[{s['start']} - {s['end']}] {s['decode']}"
                          for s in segments),
                file_name="transcript.txt")
            col2.download_button("Subtitles (.srt)", segments_to_srt(segments),
                                 file_name="transcript.srt")
            col3.download_button("Subtitles (.vtt)", segments_to_vtt(segments),
                                 file_name="transcript.vtt")
        finally:
            os.unlink(path)


if __name__ == "__main__":
    main()
