#!/bin/sh
# Build engine.zip for spark-submit --py-files.
set -e
cd "$(dirname "$0")/.."
rm -f engine.zip
python - <<'EOF'
import pathlib
import zipfile

root = pathlib.Path(".")
with zipfile.ZipFile("engine.zip", "w", zipfile.ZIP_DEFLATED) as z:
    for p in sorted(root.glob("cpp_paddle_ocr_spark/**/*.py")):
        z.write(p, p.as_posix())
print("wrote engine.zip")
EOF
