"""Realtime streaming ASR demo (reference: apps/realtime-asr/stream_asr.py).

Decodes audio incrementally through `encoder_streaming_step` with per-layer
KV/conv caches: one step per `chunk_size` subsampled frames (~chunk*80 ms),
with an 85 ms raw-audio overlap cache feeding the fbank so subsampling context
is exact (stream_asr.py:38-40). Prints the incremental transcript and RTF.

Modes: --audio_file simulates realtime from a file (testable without a mic);
--mic uses sounddevice when available.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ChunkFormer-TPU realtime streaming")
    p.add_argument("--model_checkpoint", required=True)
    p.add_argument("--audio_file", default=None, help="simulate streaming from file")
    p.add_argument("--mic", action="store_true", help="capture from microphone")
    p.add_argument("--device", type=int, default=None, help="input device index")
    p.add_argument("--list_devices", action="store_true",
                   help="list input devices and exit")
    p.add_argument("--speed", type=float, default=0.0,
                   help="file replay pace: 1.0 = realtime, 0 = as fast as possible")
    p.add_argument("--chunk_size", type=int, default=6,
                   help="subsampled frames per step (6 ~= 480 ms)")
    p.add_argument("--left_context_size", type=int, default=50)
    p.add_argument("--right_context_size", type=int, default=0)
    return p.parse_args(argv)


class StreamingASR:
    """Stateful incremental decoder over encoder_streaming_step."""

    AUDIO_CACHE_MS = 85  # subsampling context overlap (stream_asr.py:38-40)

    def __init__(self, model, chunk_size=6, left_context=50, right_context=0):
        import jax
        import jax.numpy as jnp

        from chunkformer_tpu.nn.encoder import encoder_streaming_step, init_caches
        from chunkformer_tpu.models.asr import ctc_argmax
        from chunkformer_tpu.ops.chunk import reverse_calc_length

        self.model = model
        cfg = model.config.encoder_conf
        self.c, self.L, self.R = chunk_size, left_context, right_context
        self.sr = 16000
        self.cache_samples = int(self.AUDIO_CACHE_MS * self.sr / 1000)
        # raw samples consumed per step: stride c*8 frames = c*8*160 samples
        self.step_samples = self.c * 8 * 160
        # frames needed per step: reverse_calc_length(c) + R*8 (+ window tail)
        self.frames_in = reverse_calc_length(self.c) + self.R * 8
        self.att_cache, self.cnn_cache = init_caches(cfg, self.L, batch=1,
                                                     dtype=model.dtype)
        self.offset = 0
        self.audio_buffer = np.zeros(0, np.float32)
        self.tokens = []
        self._prev_tail = 0

        def step(params, x, att, cnn, offset):
            out, att, cnn = encoder_streaming_step(
                params["encoder"], cfg, x.astype(model.dtype), att, cnn,
                self.c, self.L, self.R, offset)
            return ctc_argmax(params["ctc"], out), att, cnn

        self._step = jax.jit(step, donate_argnums=(2, 3))
        self._jnp = jnp

    def accept_audio(self, samples: np.ndarray):
        """Feed raw float32 PCM (int16 scale); returns newly final text tokens."""
        from chunkformer_tpu.ops.fbank import fbank

        self.audio_buffer = np.concatenate([self.audio_buffer, samples])
        new_tokens = []
        need = self.cache_samples + (self.frames_in - 1) * 160 + 400
        while self.audio_buffer.shape[0] >= need:
            window = self.audio_buffer[:need]
            feats = np.asarray(fbank(self._jnp.asarray(window)))
            feats = feats[self.cache_samples // 160:][: self.frames_in]
            toks, self.att_cache, self.cnn_cache = self._step(
                self.model.params, self._jnp.asarray(feats[None]),
                self.att_cache, self.cnn_cache, self._jnp.asarray(self.offset))
            toks = np.asarray(toks)[0][: self.c]  # final part only
            new_tokens.extend(int(t) for t in toks)
            self.offset += self.c
            self.audio_buffer = self.audio_buffer[self.step_samples:]
        self.tokens.extend(new_tokens)
        return new_tokens

    def text(self) -> str:
        from chunkformer_tpu.decode.outputs import get_output

        if self.model.char_dict is None:
            return " ".join(map(str, self.tokens))
        return get_output([self.tokens], self.model.char_dict)[0]


def main(argv=None):
    args = parse_args(argv)
    from chunkformer_tpu.data.capture import list_input_devices, open_capture

    if args.list_devices:
        devices = list_input_devices()
        if not devices:
            print("no input devices (or no capture backend installed)")
        for i, name in devices:
            print(f"{i}\t{name}")
        return 0

    from chunkformer_tpu.api import ChunkFormerModel

    model = ChunkFormerModel.from_pretrained(args.model_checkpoint)
    asr = StreamingASR(model, args.chunk_size, args.left_context_size,
                       args.right_context_size)

    if not args.audio_file and not args.mic:
        print("need --audio_file or --mic", file=sys.stderr)
        return 2
    source = "mic" if args.mic else args.audio_file
    try:
        cap = open_capture(source, sample_rate=asr.sr,
                           chunk_samples=asr.step_samples,
                           device=args.device, speed=args.speed)
    except RuntimeError as e:
        print(e, file=sys.stderr)
        return 2

    t_start = time.perf_counter()
    audio_s = 0.0
    with cap:
        try:
            for chunk in cap:
                audio_s += len(chunk) / asr.sr
                asr.accept_audio(chunk)
                elapsed = time.perf_counter() - t_start
                rtf = elapsed / max(audio_s, 1e-9)
                print(f"\r[{audio_s:6.1f}s RTF={rtf:.3f}] {asr.text()}",
                      end="", flush=True)
        except KeyboardInterrupt:
            pass
    print()
    print("final:", asr.text())
    return 0


if __name__ == "__main__":
    sys.exit(main())
