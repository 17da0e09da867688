"""`chunkformer-train` CLI (reference: chunkformer/bin/train.py:89-214).

Single- or multi-host training driven by the reference YAML config schema.
Distributed engines (DDP/DeepSpeed/FSDP flags, train_utils.py:57-251) are
replaced by two mesh knobs: --dp_size/--tp_size plus --sharding
(dp|fsdp|tp|fsdp_tp).
"""

from __future__ import annotations

import argparse
import copy
import logging
import os
import sys

import yaml


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ChunkFormer-TPU training")
    p.add_argument("--config", required=True, help="YAML config")
    p.add_argument("--data_type", default="raw", choices=["raw", "shard"])
    p.add_argument("--train_data", required=True)
    p.add_argument("--cv_data", required=True)
    p.add_argument("--model_dir", required=True)
    p.add_argument("--checkpoint", default=None, help="resume tag")
    p.add_argument("--override_config", action="append", default=[],
                   help='dot-path override: "a.b.c value"')
    p.add_argument("--sharding", default="dp", choices=["dp", "fsdp", "tp", "fsdp_tp"])
    p.add_argument("--tp_size", type=int, default=1)
    p.add_argument("--seed", type=int, default=777)
    p.add_argument("--freeze_modules", default=None,
                   help="comma list of param-path substrings to freeze "
                        "(e.g. 'encoder.embed,encoder.layers')")
    p.add_argument("--enc_init", default=None, help="dir of pretrained model")
    p.add_argument("--enc_init_mods", default="encoder.",
                   help="comma-separated path regexes to copy")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: call jax.distributed.initialize() "
                        "(coordinator from env; replaces torchrun c10d rdzv)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s")

    import jax

    if args.distributed:
        # multi-host bring-up (reference: utils/train_utils.py:254-274 +
        # torchrun rendezvous). On TPU pods the cluster is auto-detected; for
        # CPU/manual launches pass JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES
        # / JAX_PROCESS_ID (exercised by tests/test_distributed.py).
        coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
        nproc = os.environ.get("JAX_NUM_PROCESSES")
        pid = os.environ.get("JAX_PROCESS_ID")
        if coord and nproc is not None and pid is not None:
            jax.distributed.initialize(coordinator_address=coord,
                                       num_processes=int(nproc),
                                       process_id=int(pid))
        else:
            jax.distributed.initialize()

    from ..config import ChunkFormerConfig, override_config
    from ..data.tokenizer import build_tokenizer
    from ..data.pipeline import Dataset
    from ..models.asr import init_asr_model
    from ..models.classification import init_classification_model
    from ..models.transducer import init_transducer
    from ..parallel.mesh import make_mesh, shard_params
    from ..train.checkpoint import load_checkpoint, load_trained_modules
    from ..train.executor import Executor
    from ..train.optim import build_optimizer
    from ..train.train_step import create_train_state

    with open(args.config) as f:
        raw = yaml.safe_load(f)
    raw = override_config(raw, args.override_config)

    tokenizer = None
    if raw.get("tokenizer"):
        tokenizer = build_tokenizer(raw["tokenizer"], raw.get("tokenizer_conf", {}))
        raw["output_dim"] = tokenizer.vocab_size
    cfg = ChunkFormerConfig.from_dict(raw)

    cmvn = None
    if cfg.cmvn == "global_cmvn" and cfg.cmvn_conf.get("cmvn_file"):
        from ..api import load_cmvn_file

        cmvn = load_cmvn_file(cfg.cmvn_conf["cmvn_file"],
                              cfg.cmvn_conf.get("is_json_cmvn", True))

    n_proc = jax.process_count()
    proc = jax.process_index()
    is_classification = cfg.model == "classification"
    dataset_conf = raw.get("dataset_conf", {})
    train_ds = Dataset(args.data_type, args.train_data, tokenizer, dataset_conf,
                       partition=True, num_shards=n_proc, shard_id=proc,
                       seed=args.seed, is_classification=is_classification)
    cv_conf = copy.deepcopy(dataset_conf)
    for k in ("speed_perturb", "spec_aug", "spec_sub", "spec_trim", "shuffle"):
        cv_conf[k] = False
    if "fbank_conf" in cv_conf:
        cv_conf["fbank_conf"]["dither"] = 0.0
    cv_ds = Dataset(args.data_type, args.cv_data, tokenizer, cv_conf,
                    partition=False, seed=args.seed,
                    is_classification=is_classification)

    key = jax.random.PRNGKey(args.seed)
    if cfg.model == "transducer":
        params = init_transducer(key, cfg, cmvn)
    elif is_classification:
        params = init_classification_model(key, cfg, cmvn)
    else:
        params = init_asr_model(key, cfg, cmvn)

    if args.enc_init:
        params = load_trained_modules(params, args.enc_init, "init",
                                      args.enc_init_mods.split(","))

    mesh = make_mesh(data=-1, model=args.tp_size)
    params = shard_params(params, mesh, args.sharding)

    optimizer, _ = build_optimizer(
        raw.get("optim", "adam"), raw.get("optim_conf", {"lr": 1e-3}),
        raw.get("scheduler", "warmuplr"), raw.get("scheduler_conf", {}),
        raw.get("grad_clip", 5.0))
    if args.freeze_modules:
        from ..train.optim import freeze_modules

        optimizer = freeze_modules(optimizer, params,
                                   args.freeze_modules.split(","))
    state = create_train_state(params, optimizer)

    start_epoch = 0
    if args.checkpoint:
        p, opt, info = load_checkpoint(args.model_dir, args.checkpoint)
        state = state.__class__(
            params=jax.tree.map(jax.numpy.asarray, p),
            opt_state=opt if opt is not None else state.opt_state,
            step=jax.numpy.asarray(info.get("step", 0), jax.numpy.int32))
        start_epoch = info.get("epoch", 0) + 1
        logging.info("resumed from %s at step %s epoch %s", args.checkpoint,
                     info.get("step"), info.get("epoch"))

    os.makedirs(args.model_dir, exist_ok=True)
    if proc == 0:
        with open(os.path.join(args.model_dir, "train.yaml"), "w") as f:
            yaml.safe_dump(raw, f)

    executor = Executor(cfg, optimizer, args.model_dir,
                        log_interval=raw.get("log_interval", 100),
                        accum_grad=raw.get("accum_grad", 1),
                        save_interval=raw.get("save_interval"),
                        seed=args.seed, mesh=mesh)
    max_epoch = raw.get("max_epoch", 100)
    with mesh:
        for epoch in range(start_epoch, max_epoch):
            train_ds.set_epoch(epoch)
            state = executor.train_epoch(state, iter(train_ds), epoch, iter(cv_ds))
            cv_loss = executor.cv(state.params, iter(cv_ds))
            logging.info("epoch %d cv_loss %.4f", epoch, cv_loss)
            executor.save(state, epoch, tag=f"epoch_{epoch}", cv_loss=cv_loss)
    return 0


if __name__ == "__main__":
    sys.exit(main())
