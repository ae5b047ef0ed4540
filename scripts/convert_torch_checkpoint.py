"""Convert a released torch checkpoint pair into this framework's format.

The reference saves each model as two torch state_dict files,
``{prefix}_enc`` / ``{prefix}_dec`` (follower.py:1022-1035,
speaker.py:397-410).  This CLI maps them onto our param pytrees
(training/checkpoint.py converters, tested against synthetic state_dicts
in tests/test_checkpoint.py) and writes a data-only npz loadable by every
driver via ``--follower_prefix`` / ``--speaker_prefix``:

    python scripts/convert_torch_checkpoint.py follower \\
        snapshots/release/follower_final_release_enc \\
        snapshots/release/follower_final_release_dec \\
        snapshots/follower_release.npz
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from speaker_follower_tpu.training import checkpoint as ckpt


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", choices=["follower", "speaker"])
    ap.add_argument("enc_path")
    ap.add_argument("dec_path")
    ap.add_argument("out", help="output params path (npz)")
    ap.add_argument(
        "--use_input_att_feed", action="store_true",
        help="speaker variant with input-attention feed (model.py:465)",
    )
    args = ap.parse_args()

    if args.model == "follower":
        params = ckpt.convert_torch_follower(args.enc_path, args.dec_path)
    else:
        params = ckpt.convert_torch_speaker(
            args.enc_path, args.dec_path,
            use_input_att_feed=args.use_input_att_feed,
        )
    ckpt.save_params(args.out, params)
    import jax

    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"wrote {args.out}: {n / 1e6:.2f}M params")


if __name__ == "__main__":
    main()
