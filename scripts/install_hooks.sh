#!/bin/sh
# Install the repo's git hooks (docs/GIT_POLICY.md).
set -e
cd "$(git rev-parse --show-toplevel)"
ln -sf ../../scripts/check_blob_sizes.py .git/hooks/pre-commit
chmod +x scripts/check_blob_sizes.py
echo "installed pre-commit blob-size guard (limit 5 MB)"
