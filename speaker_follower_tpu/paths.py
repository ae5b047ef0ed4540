"""Path registry (replaces reference tasks/R2R/paths.py + vocab.py).

All paths are resolvable relative to a data root; defaults point at the
reference checkout's data so the in-repo sub-splits and vocabs work out of
the box without downloads.
"""

from __future__ import annotations

import os

# Default to the read-only reference checkout's data (connectivity graphs,
# in-repo sub-splits, vocabs, GloVe) unless overridden by env var.
DATA_ROOT = os.environ.get("SF_TPU_DATA_ROOT", "/root/reference")

CONNECTIVITY_DIR = os.path.join(DATA_ROOT, "connectivity")
R2R_DATA_DIR = os.path.join(DATA_ROOT, "tasks/R2R/data")

TRAIN_VOCAB = os.path.join(R2R_DATA_DIR, "train_vocab.txt")
SUBTRAIN_VOCAB = os.path.join(R2R_DATA_DIR, "sub_train_vocab.txt")
TRAINVAL_VOCAB = os.path.join(R2R_DATA_DIR, "trainval_vocab.txt")
TRAIN_GLOVE = os.path.join(R2R_DATA_DIR, "train_glove.npy")
TRAINVAL_GLOVE = os.path.join(R2R_DATA_DIR, "trainval_glove.npy")

MEAN_POOLED_FEATURE_STORES = {
    "imagenet": os.path.join(DATA_ROOT, "img_features/ResNet-152-imagenet.tsv"),
    "places365": os.path.join(DATA_ROOT, "img_features/ResNet-152-places365.tsv"),
}

# Per-view res5c conv-feature stores (reference paths.py:1-4; written by
# the precompute pipeline with --feature_type convolutional).
CONVOLUTIONAL_FEATURE_STORES = {
    "imagenet": os.path.join(DATA_ROOT, "img_features/imagenet_convolutional"),
    "places365": os.path.join(DATA_ROOT, "img_features/places365_convolutional"),
}

# Bottom-up detection stores + Visual Genome vocabs (reference
# paths.py:11-16).
BOTTOM_UP_FEATURE_STORE = os.path.join(DATA_ROOT, "img_features/bottom_up_10_100")
BOTTOM_UP_FEATURE_CACHE = os.path.join(DATA_ROOT, "img_features/bottom_up_10_100.pkl")
BOTTOM_UP_FEATURE_CACHE_DIR = os.path.join(
    DATA_ROOT, "img_features/bottom_up_10_100_cache"
)
VG_ATTRIBUTE_VOCAB = os.path.join(DATA_ROOT, "data/visual_genome/attributes_vocab.txt")
VG_OBJECT_VOCAB = os.path.join(DATA_ROOT, "data/visual_genome/objects_vocab.txt")

# Writable output locations live in this repo.
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT_DIR = os.path.join(REPO_ROOT, "results")
SNAPSHOT_DIR = os.path.join(REPO_ROOT, "snapshots")
PLOT_DIR = os.path.join(REPO_ROOT, "plots")
CACHE_DIR = os.path.join(REPO_ROOT, ".cache")


def split_path(split: str) -> str:
    return os.path.join(R2R_DATA_DIR, f"R2R_{split}.json")
