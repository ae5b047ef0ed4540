"""Shared CLI setup: args -> (datasets, graph bank, env tables, models).

Replaces the composed-argparse setup helpers of the reference
(train.py:169-242, train_speaker.py:171-221, ImageFeatures.add_args at
env.py:318-325).  Hyperparameters mirror train.py:26-40.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from .. import paths
from ..data.dataset import R2RDataset
from ..data.features import (
    MEAN_POOLED_DIM,
    load_tsv_feature_bank,
    random_feature_bank,
    zero_feature_bank,
)
from ..data.graph import load_graph_bank
from ..data.text import Tokenizer, read_vocab
from ..env import vecenv
from ..evaluation.follower_eval import Evaluation
from ..evaluation.speaker_eval import SpeakerEvaluation
from ..training.trainer import TrainConfig

WORD_EMBEDDING_SIZE = 300
HIDDEN_SIZE = 512
DROPOUT_RATIO = 0.5
BATCH_SIZE = 100
MAX_INPUT_LENGTH = 80
EPISODE_LEN = 10


def add_common_args(parser: argparse.ArgumentParser):
    parser.add_argument(
        "--image_feature_type",
        choices=["none", "mean_pooled", "random",
                 "convolutional_attention", "bottom_up_attention"],
        default="mean_pooled",
        help="'random' is a synthetic bank for smoke runs without the "
        "TSV.  convolutional_attention / bottom_up_attention (flag parity "
        "with reference env.py:318-325) are pooled into panorama banks "
        "here — the reference's pano env raises NotImplementedError on "
        "both (env.py:299-312)",
    )
    parser.add_argument(
        "--image_feature_datasets", nargs="+",
        choices=["imagenet", "places365"], default=["imagenet"],
    )
    # bottom-up / convolutional knobs (reference env.py:323-325)
    parser.add_argument("--bottom_up_detections", type=int, default=20)
    parser.add_argument(
        "--bottom_up_detection_embedding_size", type=int, default=20,
    )
    parser.add_argument(
        "--downscale_convolutional_features", action="store_true",
    )
    parser.add_argument(
        "--bottom_up_cache_dir", default=paths.BOTTOM_UP_FEATURE_CACHE_DIR,
        help="precomputed detection cache (scripts/cache_bottom_up.py "
        "layout: {dir}/{scan}/d={k}.pkl)",
    )
    parser.add_argument("--data_root", default=paths.DATA_ROOT)
    parser.add_argument("--batch_size", type=int, default=BATCH_SIZE)
    parser.add_argument("--no_save", action="store_true")
    parser.add_argument(
        "--use_train_subset", action="store_true",
        help="use the in-repo sub_* splits and vocab",
    )
    parser.add_argument("--bfloat16_features", action="store_true")
    parser.add_argument(
        "--bfloat16_compute", action="store_true",
        help="mixed precision: run model matmuls in bf16 on the MXU "
        "(softmax/loss/Adam stay f32)",
    )
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard the episode batch over ALL visible devices "
        "(jax.sharding Mesh; params/tables replicated, gradients psum'd "
        "by XLA). Batch size must be a multiple of the device count.",
    )
    parser.add_argument(
        "--pallas", action="store_true",
        help="use the fused Pallas pano-attention kernel for follower "
        "rollouts (train + eval; pads the feature bank views 36->40)",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="rematerialize rollout activations in the backward pass "
        "(jax.checkpoint): ~10x lower peak activation memory for very "
        "large episode batches, identical values",
    )
    parser.add_argument(
        "--model_parallel", type=int, default=1, metavar="N",
        help="tensor-parallel degree: build a 2-D (data, model=N) mesh "
        "over all visible devices and column-shard the weight matrices "
        "(implies data parallelism over the remaining factor)",
    )
    parser.add_argument(
        "--host_data", action="store_true",
        help="disable the device-resident data pipeline: dispatch one "
        "train step per iteration instead of one K-step scanned program "
        "per interval (debugging / memory-constrained hosts)",
    )
    parser.add_argument(
        "--profile_dir", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the first post-warmup "
        "training interval into DIR (open with tensorboard/xprof)",
    )
    parser.add_argument("--snapshot_dir", default=paths.SNAPSHOT_DIR)
    parser.add_argument("--result_dir", default=paths.RESULT_DIR)
    parser.add_argument("--plot_dir", default=paths.PLOT_DIR)
    parser.add_argument("--cache_dir", default=paths.CACHE_DIR)
    return parser


def resolve_vocab(args):
    return paths.SUBTRAIN_VOCAB if args.use_train_subset else paths.TRAIN_VOCAB


def resolve_splits(args, train_splits, val_splits):
    if args.use_train_subset:
        train_splits = ["sub_" + s for s in train_splits]
        val_splits = ["sub_" + s for s in val_splits]
    return train_splits, val_splits


def load_glove(args, vocab):
    """GloVe rows for ``vocab``, frozen in the encoder (train.py:32-37).

    train_glove.npy lines up with train_vocab.txt row for row.  For any
    other vocab (the sub-split vocab), rows are word-mapped from the full
    vocab — every sub-vocab word appears in the full vocab, so the mapping
    is exact; if the overlap is ever below half the vocab, fall back to
    trained embeddings.
    """
    glove = np.load(paths.TRAIN_GLOVE)
    if glove.shape[0] == len(vocab):
        return glove
    from ..data.text import read_vocab

    full_index = {w: i for i, w in enumerate(read_vocab(paths.TRAIN_VOCAB))}
    out = np.zeros((len(vocab), glove.shape[1]), glove.dtype)
    matched = 0
    for i, word in enumerate(vocab):
        j = full_index.get(word)
        if j is not None:
            out[i] = glove[j]
            matched += 1
    if matched < len(vocab) // 2:
        return None
    return out


def build_world(args, splits, tokenizer, data_dirs=None):
    """Graph bank + env tables + datasets for all given splits.

    ``data_dirs``: optional {name: dir} overriding where a split's
    R2R_<split>.json is read from (None entries use the default)."""
    datasets = {
        name: R2RDataset(
            [split], tokenizer=tokenizer, batch_size=args.batch_size,
            data_dir=(data_dirs or {}).get(name),
        )
        for name, split in splits.items()
    }
    scans = sorted(set().union(*[d.scans for d in datasets.values()]))
    bank = load_graph_bank(scans, paths.CONNECTIVITY_DIR, cache_dir=args.cache_dir)

    import jax
    import jax.numpy as jnp

    feat_dtype = jnp.bfloat16 if args.bfloat16_features else jnp.float32
    if args.image_feature_type == "none":
        # construct on device — a host-side 3.2 GB zeros array would be
        # shipped over the TPU tunnel
        feats = jnp.zeros((bank.total_nodes, 36, MEAN_POOLED_DIM), feat_dtype)
    elif args.image_feature_type == "random":
        feats = jax.random.normal(
            jax.random.PRNGKey(0),
            (bank.total_nodes, 36, MEAN_POOLED_DIM),
            feat_dtype,
        )
    elif args.image_feature_type == "convolutional_attention":
        from ..data.features import ConvolutionalFeatureStore, conv_feature_bank

        stores = [
            paths.CONVOLUTIONAL_FEATURE_STORES[d]
            for d in sorted(args.image_feature_datasets)
        ]
        missing = [s for s in stores if not os.path.isdir(s)]
        if missing:
            raise FileNotFoundError(
                f"convolutional feature store(s) not found: {missing}; "
                "run the precompute pipeline (pipeline/precompute.py "
                "--feature_type convolutional) or use another "
                "--image_feature_type"
            )
        store = ConvolutionalFeatureStore(
            stores, split=True,
            downscaled=args.downscale_convolutional_features,
        )
        feats = jnp.asarray(conv_feature_bank(store, bank), feat_dtype)
    elif args.image_feature_type == "bottom_up_attention":
        from ..data.bottom_up import (
            BottomUpFeaturizer,
            mean_pooled_from_bottom_up,
        )

        if not os.path.isdir(args.bottom_up_cache_dir):
            raise FileNotFoundError(
                f"bottom-up cache dir not found: {args.bottom_up_cache_dir}; "
                "build it with scripts/cache_bottom_up.py or use another "
                "--image_feature_type"
            )
        featurizer = BottomUpFeaturizer(
            args.bottom_up_detections,
            paths.VG_OBJECT_VOCAB,
            paths.VG_ATTRIBUTE_VOCAB,
            precomputed_cache_dir=args.bottom_up_cache_dir,
        )
        feats = jnp.asarray(
            mean_pooled_from_bottom_up(
                featurizer.build_packed_bank(bank)
            ),
            feat_dtype,
        )
    else:
        stores = [
            paths.MEAN_POOLED_FEATURE_STORES[d]
            for d in sorted(args.image_feature_datasets)
        ]
        missing = [s for s in stores if not os.path.exists(s)]
        if missing:
            raise FileNotFoundError(
                f"feature store(s) not found: {missing}; download them or "
                "use --image_feature_type none/random"
            )
        feats = jnp.asarray(load_tsv_feature_bank(stores, bank), feat_dtype)
    tables = vecenv.make_env_tables(
        bank, feats, pad_views=getattr(args, "pallas", False)
    )
    feature_dim = int(tables.features.shape[-1])
    return datasets, bank, tables, feature_dim


def feature_name(args):
    if args.image_feature_type == "mean_pooled":
        return "+".join(sorted(args.image_feature_datasets)) + "_mean_pooled"
    if args.image_feature_type == "convolutional_attention":
        # ConvolutionalImageFeatures.get_name (env.py:424-428)
        name = "+".join(sorted(args.image_feature_datasets))
        name += "_convolutional_attention"
        if args.downscale_convolutional_features:
            name += "_downscale"
        return name
    if args.image_feature_type == "bottom_up_attention":
        # BottomUpImageFeatures.get_name (env.py:582-583)
        return "bottom_up_attention_d=%d" % args.bottom_up_detections
    return args.image_feature_type


def make_train_config(args, model_prefix, feedback="sample", use_glove=True):
    return TrainConfig(
        feedback=feedback,
        use_glove=use_glove,
        compute_dtype="bfloat16" if args.bfloat16_compute else None,
        use_pallas=getattr(args, "pallas", False),
        remat=getattr(args, "remat", False),
        profile_dir=getattr(args, "profile_dir", None),
        device_data=not getattr(args, "host_data", False),
        no_save=args.no_save,
        snapshot_dir=args.snapshot_dir,
        result_dir=args.result_dir,
        plot_dir=args.plot_dir,
        model_prefix=model_prefix,
    )


def resolve_mesh(args):
    """Mesh from the parallelism flags: 2-D (data, model) for
    --model_parallel N>1, 1-D data for --data_parallel, else None."""
    if getattr(args, "model_parallel", 1) > 1:
        from ..parallel import mesh as pm

        return pm.make_mesh2(model=args.model_parallel)
    if args.data_parallel:
        from ..parallel import mesh as pm

        return pm.make_mesh()
    return None


def follower_val_envs(val_splits, datasets, bank):
    return {
        split: (datasets[split], Evaluation([split], bank)) for split in val_splits
    }


def speaker_val_envs(val_splits, datasets):
    return {
        split: (datasets[split], SpeakerEvaluation([split])) for split in val_splits
    }
