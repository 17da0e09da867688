"""`chunkformer-recognize` batch evaluation CLI
(reference: chunkformer/bin/recognize.py:185-309): decode a test set with one
or more strategies, write per-mode hypothesis files, report WER when
references exist.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


MODES = ["ctc_greedy_search", "ctc_prefix_beam_search",
         "ctc_prefix_beam_search_batched", "attention", "attention_rescoring",
         # transducer modes (reference: bin/recognize.py:63-72)
         "rnnt_greedy_search", "rnnt_beam_search", "rnnt_beam_attn_rescoring"]


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ChunkFormer-TPU recognition")
    p.add_argument("--model_checkpoint", required=True)
    p.add_argument("--test_data", required=True, help="TSV/list with wav [txt]")
    p.add_argument("--result_dir", required=True)
    p.add_argument("--modes", nargs="+", default=["ctc_greedy_search"], choices=MODES)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--beam_size", type=int, default=10)
    p.add_argument("--chunk_size", type=int, default=-1)
    p.add_argument("--left_context_size", type=int, default=-1)
    p.add_argument("--right_context_size", type=int, default=-1)
    p.add_argument("--ctc_weight", type=float, default=0.3)
    p.add_argument("--reverse_weight", type=float, default=0.0)
    p.add_argument("--blank_penalty", type=float, default=0.0)
    p.add_argument("--context_list", default=None, help="hotword file")
    p.add_argument("--context_score", type=float, default=6.0)
    p.add_argument("--simulate_streaming", action="store_true",
                   help="encode chunk-by-chunk through the streaming step "
                        "(reference: bin/recognize.py --simulate_streaming -> "
                        "encoder.forward_chunk_by_chunk)")
    return p.parse_args(argv)


def _streaming_encode(model, xs, lens, c: int, left: int, right: int):
    """Batch chunk-by-chunk encode via ``encoder_streaming_step``.

    Validates streaming WER offline: identical per-layer KV/conv cache flow
    as the realtime app, but over a padded feature batch. The reference
    decodes one utterance at a time through `forward_chunk_by_chunk`
    (encoder.py:387-459); here all utterances in the batch step together.
    """
    import jax
    import jax.numpy as jnp

    from ..nn.encoder import encoder_streaming_step, init_caches
    from ..ops.chunk import calc_length, reverse_calc_length

    cfg = model.config.encoder_conf
    sub = cfg.subsampling_rate
    b, t, f = xs.shape
    att, cnn = init_caches(cfg, left, batch=b, dtype=model.dtype)
    frames_in = reverse_calc_length(c) + right * sub
    stride = c * sub
    key = ("sim_stream", c, left, right, frames_in, b)
    if key not in model._jit_cache:
        model._jit_cache[key] = jax.jit(
            lambda p, x, a, cn, off: encoder_streaming_step(
                p["encoder"], cfg, x, a, cn, c, left, right, off),
            donate_argnums=(2, 3))
    step = model._jit_cache[key]

    n_out = int(calc_length(t))
    out_parts = []
    for s in range(max(1, -(-n_out // c))):
        win = np.zeros((b, frames_in, f), np.float32)
        seg = xs[:, s * stride: s * stride + frames_in]
        win[:, : seg.shape[1]] = seg
        out, att, cnn = step(model.params, jnp.asarray(win, model.dtype),
                             att, cnn, jnp.asarray(s * c, jnp.int32))
        out_parts.append(np.asarray(out[:, :c], np.float32))
    enc_out = np.concatenate(out_parts, axis=1)[:, :n_out]
    return jnp.asarray(enc_out), calc_length(lens)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO)

    import jax.numpy as jnp

    from ..api import ChunkFormerModel
    from ..data.pipeline import text_line_source
    from ..decode.outputs import tokens_to_text, word_error_rate
    from ..decode.search import (attention_beam_search,
                                 attention_beam_search_device,
                                 attention_rescoring,
                                 ctc_greedy_search, ctc_prefix_beam_search)

    model = ChunkFormerModel.from_pretrained(args.model_checkpoint)
    cfg = model.config
    samples = list(text_line_source(args.test_data))
    os.makedirs(args.result_dir, exist_ok=True)

    context_graph = None
    if args.context_list:
        from ..data.tokenizer import CharTokenizer
        from ..decode.context_graph import ContextGraph

        table = {v: k for k, v in model.char_dict.items()}
        tok = CharTokenizer(table)
        context_graph = ContextGraph.from_file(args.context_list, tok,
                                               args.context_score)

    files = {m: open(os.path.join(args.result_dir, f"{m}.txt"), "w") for m in args.modes}
    hyps_by_mode = {m: [] for m in args.modes}
    refs = []

    for i in range(0, len(samples), args.batch_size):
        batch = samples[i:i + args.batch_size]
        feats = [model.extract_features(s["wav"]) for s in batch]
        max_t = max(f.shape[0] for f in feats)
        xs = np.zeros((len(batch), max_t, feats[0].shape[1]), np.float32)
        lens = np.zeros(len(batch), np.int32)
        for j, f in enumerate(feats):
            xs[j, : f.shape[0]] = f
            lens[j] = f.shape[0]
        if args.simulate_streaming:
            if args.chunk_size <= 0:
                raise SystemExit("--simulate_streaming requires --chunk_size > 0")
            if args.left_context_size < 0 or args.right_context_size < 0:
                # the batch path's -1 = "full context" convention has no
                # streaming counterpart; silently clamping to 0 would quietly
                # produce much worse transcripts (ADVICE r4 item 4)
                raise SystemExit("--simulate_streaming requires non-negative "
                                 "--left_context_size/--right_context_size")
            enc_out, enc_lens = _streaming_encode(
                model, xs, lens, args.chunk_size,
                args.left_context_size, args.right_context_size)
        else:
            enc_out, enc_lens = model.encode(xs, lens, args.chunk_size,
                                             args.left_context_size, args.right_context_size)
        enc_lens = np.asarray(enc_lens)
        logp = None
        if "ctc" in model.params:
            logp = np.asarray(model.ctc_logprobs(enc_out))
            if args.blank_penalty != 0.0:
                logp[..., 0] -= args.blank_penalty

        for mode in args.modes:
            if mode == "ctc_greedy_search":
                results = ctc_greedy_search(logp, enc_lens)
            elif mode == "ctc_prefix_beam_search":
                results = ctc_prefix_beam_search(logp, enc_lens, args.beam_size,
                                                 context_graph)
            elif mode == "ctc_prefix_beam_search_batched":
                from ..decode.batched_beam import (batched_beam_to_results,
                                                   ctc_prefix_beam_search_batched)

                import jax.numpy as _jnp

                toks, tlens, scores = ctc_prefix_beam_search_batched(
                    _jnp.asarray(logp), _jnp.asarray(enc_lens), args.beam_size)
                results = batched_beam_to_results(toks, tlens, scores)
            elif mode == "attention":
                mask = np.arange(enc_out.shape[1])[None, :] < enc_lens[:, None]
                # device-scan beam: one sync per batch instead of one per
                # decode step (host loop kept as the parity oracle)
                results = attention_beam_search_device(
                    model.params, cfg, enc_out, jnp.asarray(mask),
                    args.beam_size)
            elif mode == "attention_rescoring":
                prefix = ctc_prefix_beam_search(logp, enc_lens, args.beam_size,
                                                context_graph)
                results = attention_rescoring(model.params, cfg, prefix, enc_out,
                                              enc_lens, args.ctc_weight,
                                              args.reverse_weight)
            elif mode == "rnnt_greedy_search":
                from types import SimpleNamespace

                seqs = model._transducer_greedy(enc_out, enc_lens)
                results = [SimpleNamespace(tokens=seq) for seq, _times in seqs]
            else:  # rnnt_beam_search / rnnt_beam_attn_rescoring
                from types import SimpleNamespace

                from ..models.transducer_search import (
                    transducer_attention_rescoring, transducer_prefix_beam_search)

                results = []
                for bi in range(len(batch)):
                    enc_b = np.asarray(enc_out[bi, : enc_lens[bi]], np.float32)
                    beams = transducer_prefix_beam_search(
                        model.params, cfg, enc_b, args.beam_size,
                        ctc_log_probs=(logp[bi, : enc_lens[bi]]
                                       if logp is not None else None),
                        ctc_weight=args.ctc_weight,
                        blank=cfg.ctc_conf.ctc_blank_id)
                    if mode == "rnnt_beam_attn_rescoring" and "decoder" in model.params:
                        toks = transducer_attention_rescoring(
                            model.params, cfg, beams, enc_b, args.reverse_weight)
                    else:
                        toks = beams[0].hyp[1:] if beams else []
                    results.append(SimpleNamespace(tokens=toks))
            for s, r in zip(batch, results):
                text = tokens_to_text(r.tokens, model.char_dict)
                files[mode].write(f"{s.get('key', s['wav'])}\t{text}\n")
                hyps_by_mode[mode].append(text)
        refs.extend(s.get("txt", "") for s in batch)
        logging.info("decoded %d/%d", min(i + args.batch_size, len(samples)),
                     len(samples))

    for mode, f in files.items():
        f.close()
        if any(refs):
            wer = word_error_rate(hyps_by_mode[mode], refs)
            logging.info("%s WER: %.4f", mode, wer)
            with open(os.path.join(args.result_dir, f"{mode}.wer"), "w") as wf:
                wf.write(f"WER: {wer:.4f}\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
