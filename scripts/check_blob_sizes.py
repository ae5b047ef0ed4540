#!/usr/bin/env python
"""Pre-commit guard: refuse to commit any staged blob larger than 5 MB.

Policy (docs/GIT_POLICY.md): the repository history already carries
~220 MB of superseded binary checkpoints from rounds 1-3; rewriting
history to strip them is NOT done unilaterally (it would invalidate the
build driver's commit tracking), so the enforceable half of the policy
is "never add another large binary".  Install with:

    ln -sf ../../scripts/check_blob_sizes.py .git/hooks/pre-commit

(`scripts/install_hooks.sh` does this.)  Bypass for a deliberate,
documented exception with `git commit --no-verify`.
"""

import subprocess
import sys

LIMIT = 5 * 1024 * 1024


def main() -> int:
    out = subprocess.run(
        ["git", "diff", "--cached", "--name-only", "--diff-filter=AM", "-z"],
        check=True, capture_output=True, text=True,
    ).stdout
    bad = []
    for path in filter(None, out.split("\0")):
        # size of the STAGED blob (not the worktree file)
        obj = subprocess.run(
            ["git", "rev-parse", f":{path}"], capture_output=True, text=True
        )
        if obj.returncode != 0:
            continue
        size = int(subprocess.run(
            ["git", "cat-file", "-s", obj.stdout.strip()],
            check=True, capture_output=True, text=True,
        ).stdout)
        if size > LIMIT:
            bad.append((path, size))
    if bad:
        sys.stderr.write(
            "pre-commit: refusing blobs over 5 MB (docs/GIT_POLICY.md):\n"
        )
        for path, size in bad:
            sys.stderr.write(f"  {size / 1e6:8.1f} MB  {path}\n")
        sys.stderr.write(
            "Large artifacts (checkpoints, TSVs, traces) belong in runs/ "
            "untracked or referenced by path; use --no-verify only with a "
            "written exception in docs/GIT_POLICY.md.\n"
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
