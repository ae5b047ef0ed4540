"""Small shared helpers (reference tasks/R2R/utils.py:176-265)."""

from __future__ import annotations

import json
import math
import subprocess
import sys
import time


def flatten(lol):
    return [x for lst in lol for x in lst]


def all_equal(lst):
    return all(x == lst[0] for x in lst[1:])


def structured_map(function, *args, nested: bool = False):
    acc = []
    for t in zip(*args):
        if nested:
            acc.append([function(*inner) for inner in zip(*t)])
        else:
            acc.append(function(*t))
    return acc


def pretty_json_dump(obj, fp):
    json.dump(obj, fp, sort_keys=True, indent=4, separators=(",", ":"))


def as_minutes(s):
    m = math.floor(s / 60)
    return "%dm %ds" % (m, s - m * 60)


def time_since(since, percent):
    now = time.time()
    s = now - since
    es = s / percent
    return "%s (- %s)" % (as_minutes(s), as_minutes(es - s))


def run(arg_parser, entry_function):
    """CLI wrapper: log git SHA + diff + argv + args JSON, optional
    pdb/ipdb (reference utils.py:233-265, minus the cuda toggle)."""
    arg_parser.add_argument("--pdb", action="store_true")
    arg_parser.add_argument("--ipdb", action="store_true")
    args = arg_parser.parse_args()

    subprocess.call("git rev-parse HEAD", shell=True, stdout=sys.stdout)
    subprocess.call("git --no-pager diff --stat", shell=True, stdout=sys.stdout)
    sys.stdout.write(" ".join(sys.argv) + "\n")
    json.dump(
        {k: v for k, v in vars(args).items() if not callable(v)},
        sys.stdout,
        default=str,
    )
    sys.stdout.write("\n")

    # Persistent XLA compilation cache for every CLI entry point: the
    # fused-search/trainer programs cost seconds-to-minutes of compile
    # per fresh process and never change between runs.
    from .compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    if cache_dir:
        sys.stdout.write(f"xla compilation cache: {cache_dir}\n")

    if args.ipdb:
        import ipdb

        ipdb.runcall(entry_function, args)
    elif args.pdb:
        import pdb

        pdb.runcall(entry_function, args)
    else:
        entry_function(args)
