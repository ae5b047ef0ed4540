"""Every CLI's argparse parser must construct and parse its flags.

Regression guard: round 5 caught `--data_parallel` being registered by
BOTH cli.common.add_common_args and cli.rational_follower's own
make_arg_parser — argparse raises ArgumentError at parser construction,
so the whole CLI was dead on arrival and no unit test noticed (the CLIs
were only ever exercised end-to-end on-chip).  Constructing each parser
here catches duplicate/conflicting registrations at test time.
"""

import importlib

import pytest

CLI_MODULES = [
    "speaker_follower_tpu.cli.augment",
    "speaker_follower_tpu.cli.eval_simple_agents",
    "speaker_follower_tpu.cli.rational_follower",
    "speaker_follower_tpu.cli.rational_speaker",
    "speaker_follower_tpu.cli.train_follower",
    "speaker_follower_tpu.cli.train_speaker",
    "speaker_follower_tpu.cli.validate_follower",
    "speaker_follower_tpu.cli.validate_speaker",
]

# minimal positional arguments each parser needs (checkpoint prefixes etc.)
POSITIONAL = {
    "speaker_follower_tpu.cli.augment": ["SPEAKER_PREFIX", "OUT.json"],
    "speaker_follower_tpu.cli.rational_follower": ["F_PREFIX", "S_PREFIX"],
    "speaker_follower_tpu.cli.rational_speaker": ["S_PREFIX", "F_PREFIX"],
    "speaker_follower_tpu.cli.validate_follower": ["F_PREFIX"],
    "speaker_follower_tpu.cli.validate_speaker": ["S_PREFIX"],
}


@pytest.mark.parametrize("module_name", CLI_MODULES)
def test_parser_constructs_and_parses(module_name):
    mod = importlib.import_module(module_name)
    parser = mod.make_arg_parser()  # raises on conflicting option strings
    args = parser.parse_args(POSITIONAL.get(module_name, []))
    # the shared mesh flags must be present exactly once, with defaults
    assert args.data_parallel is False
    assert args.model_parallel == 1


def test_rational_follower_data_parallel_flag_parses():
    mod = importlib.import_module("speaker_follower_tpu.cli.rational_follower")
    args = mod.make_arg_parser().parse_args(
        ["F", "S", "--data_parallel", "--fused_search", "--beam_size", "40"]
    )
    assert args.data_parallel and args.fused_search and args.beam_size == 40


def test_rational_follower_speaker_weights_flag():
    mod = importlib.import_module("speaker_follower_tpu.cli.rational_follower")
    args = mod.make_arg_parser().parse_args(["F", "S"])
    assert args.speaker_weights == (0.0, 0.95)  # reference default
    args = mod.make_arg_parser().parse_args(
        ["F", "S", "--speaker_weights", "0,0.25,0.5,0.75,0.95,1.0"]
    )
    assert args.speaker_weights == (0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
