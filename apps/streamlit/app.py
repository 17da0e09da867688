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
                              type=["wav", "mp3", "flac", "mp4", "m4a", "ogg"])
    if upload and model_dir:
        model = load_model(model_dir)
        suffix = os.path.splitext(upload.name)[1]
        with tempfile.NamedTemporaryFile(suffix=suffix, delete=False) as f:
            f.write(upload.read())
            path = f.name
        try:
            t0 = time.perf_counter()
            with st.spinner("Transcribing..."):
                segments = model.endless_decode(
                    path, chunk_size=int(chunk_size), left_context_size=int(left_ctx),
                    right_context_size=int(right_ctx), total_batch_duration=int(budget),
                    return_timestamps=True, max_silence_duration=float(max_silence))
            elapsed = time.perf_counter() - t0
            st.success(f"Done in {elapsed:.1f}s")
            if suffix in (".mp4", ".m4a"):
                st.video(upload)
            else:
                st.audio(upload)
            query = st.text_input("Search transcript")
            for seg in segments:
                text = seg["decode"]
                if query and query.lower() not in text.lower():
                    continue
                st.markdown(f"**{seg['start']} → {seg['end']}**  {text}")
            st.download_button(
                "Download transcript",
                "\n".join(f"[{s['start']} - {s['end']}] {s['decode']}" for s in segments),
                file_name="transcript.txt")
        finally:
            os.unlink(path)


if __name__ == "__main__":
    main()
