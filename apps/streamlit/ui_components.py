"""Streamlit UI components: synchronized subtitle/video player.

Behavioral counterpart of the reference's synced transcript player
(reference: apps/streamlit/ui_components.py:380 render_synchronized_player):
an HTML component pairing a <video>/<audio> element with a scrollable
transcript pane. JS on `timeupdate` highlights the active segment and
auto-scrolls it into view; clicking a segment seeks the media. Written from
scratch around our segment dicts ({"decode", "start", "end"} with
hh:mm:ss:ms stamps).
"""

from __future__ import annotations

import base64
import html
import json
import os
import sys
from typing import Dict, List

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))

from chunkformer_tpu.decode.outputs import parse_timestamp  # noqa: E402


def prepare_segments_for_player(segments: List[Dict]) -> List[Dict]:
    """Segment dicts -> [{"start": s, "end": s, "text": str}] with float
    seconds, dropping empties and enforcing monotonic non-overlap."""
    out = []
    prev_end = 0.0
    for seg in segments:
        text = (seg.get("decode") or "").strip()
        if not text:
            continue
        start = seg.get("start_time")
        end = seg.get("end_time")
        if start is None:
            start = parse_timestamp(seg["start"])
        if end is None:
            end = parse_timestamp(seg["end"])
        start = max(float(start), prev_end)
        end = max(float(end), start)
        prev_end = end
        out.append({"start": round(start, 3), "end": round(end, 3),
                    "label": seg.get("start", ""), "text": text})
    return out


def _player_html(media_b64: str, mime_type: str, segments_json: str,
                 height: int) -> str:
    tag = "audio" if mime_type.startswith("audio/") else "video"
    return f"""
<style>
  .cf-sync {{ display: flex; gap: 1rem; font-family: system-ui, sans-serif; }}
  .cf-media {{ flex: 3 1 360px; min-width: 280px; }}
  .cf-media {tag} {{ width: 100%; border-radius: 8px; display: block; }}
  .cf-transcript {{ flex: 2 1 260px; overflow-y: auto; max-height: {height - 40}px;
                   border: 1px solid #d0d4dc; border-radius: 8px; padding: 6px; }}
  .cf-seg {{ padding: 6px 8px; border-radius: 6px; cursor: pointer;
            margin-bottom: 2px; line-height: 1.35; }}
  .cf-seg:hover {{ background: #eef1f7; }}
  .cf-seg.active {{ background: #dde6ff; font-weight: 600; }}
  .cf-seg .t {{ font-size: 0.75em; color: #667; margin-right: 6px;
               font-variant-numeric: tabular-nums; }}
</style>
<div class="cf-sync">
  <div class="cf-media">
    <{tag} id="cf-player" controls src="data:{mime_type};base64,{media_b64}"></{tag}>
  </div>
  <div class="cf-transcript" id="cf-transcript"></div>
</div>
<script>
  const segments = {segments_json};
  const player = document.getElementById("cf-player");
  const pane = document.getElementById("cf-transcript");
  segments.forEach((seg, i) => {{
    const div = document.createElement("div");
    div.className = "cf-seg";
    div.id = "cf-seg-" + i;
    const t = document.createElement("span");
    t.className = "t";
    t.textContent = seg.label;
    div.appendChild(t);
    div.appendChild(document.createTextNode(seg.text));
    div.addEventListener("click", () => {{
      player.currentTime = seg.start + 0.01;
      player.play();
    }});
    pane.appendChild(div);
  }});
  let active = -1;
  player.addEventListener("timeupdate", () => {{
    const t = player.currentTime;
    let idx = -1;
    for (let i = 0; i < segments.length; i++) {{
      if (t >= segments[i].start && t < segments[i].end) {{ idx = i; break; }}
      if (segments[i].start > t) break;
    }}
    if (idx === active) return;
    if (active >= 0)
      document.getElementById("cf-seg-" + active).classList.remove("active");
    active = idx;
    if (idx >= 0) {{
      const el = document.getElementById("cf-seg-" + idx);
      el.classList.add("active");
      el.scrollIntoView({{ block: "nearest", behavior: "smooth" }});
    }}
  }});
</script>
"""


def render_synchronized_player(media_bytes: bytes, mime_type: str,
                               segments: List[Dict], height: int = 560) -> None:
    """Render the synced player inside Streamlit."""
    import streamlit as st
    import streamlit.components.v1 as components

    prepared = prepare_segments_for_player(segments)
    if not media_bytes or not prepared:
        st.warning("Nothing to synchronize: missing media or empty transcript.")
        return
    safe = [{**p, "text": html.escape(p["text"]), "label": html.escape(p["label"])}
            for p in prepared]
    components.html(
        _player_html(base64.b64encode(media_bytes).decode("ascii"), mime_type,
                     json.dumps(safe, ensure_ascii=False), height),
        height=height, scrolling=False)


MIME_BY_EXT = {
    ".mp4": "video/mp4", ".m4a": "audio/mp4", ".webm": "video/webm",
    ".mov": "video/quicktime", ".wav": "audio/wav", ".mp3": "audio/mpeg",
    ".flac": "audio/flac", ".ogg": "audio/ogg",
}


def guess_mime(filename: str) -> str:
    return MIME_BY_EXT.get(os.path.splitext(filename)[1].lower(),
                           "application/octet-stream")
