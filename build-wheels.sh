#!/bin/bash
# Build granne-tpu wheels (reference parity: /root/reference/build-wheels.sh
# builds manylinux wheels for five CPython versions inside the
# quay.io/pypa/manylinux1 container; same shape here, portable to any host).
#
# Inside a manylinux container this loops over every CPython under /opt/python
# and repairs with auditwheel; on a plain host it builds one wheel with the
# current interpreter.  The native C++ codec is compiled into the wheel by
# setup.py's build hook when g++ is present (and otherwise builds lazily at
# first import, so the wheel is still functional).
set -euo pipefail
cd "$(dirname "$0")"

OUT=${WHEELHOUSE:-dist}
mkdir -p "$OUT"

build_one() {
    local py=$1
    echo "=== building wheel with $py ==="
    "$py" -m pip wheel . --no-deps --no-build-isolation -w "$OUT"
}

if [ -d /opt/python ]; then
    # manylinux container: all supported CPythons
    for py in /opt/python/cp3{10,11,12,13}*/bin/python; do
        [ -x "$py" ] && build_one "$py"
    done
    if command -v auditwheel >/dev/null; then
        for whl in "$OUT"/granne_tpu-*linux_*.whl; do
            auditwheel repair "$whl" -w "$OUT" && rm -f "$whl"
        done
    fi
else
    build_one "${PYTHON:-python3}"
fi

ls -l "$OUT"/granne_tpu-*.whl
