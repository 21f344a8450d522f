#!/bin/bash
# Build the UNMODIFIED C++ reference (/root/reference, read-only) on Linux.
#
# The reference is an MSVC project; three portability gaps are bridged
# without touching its sources:
#   1. msvc_compat.h  (-include): errno_t / sprintf_s / fopen_s
#   2. -D'__declspec(x)='        : neutralise dllexport/dllimport
#   3. case/Include/cutil.h      : Src/cSIFT3D.cc includes "../Include/cutil.h"
#                                  (lowercase), fine on NTFS, missing here.
# CHECK_ENABLE is defined so GSS/DoG pyramids survive extraction and the
# driver can dump them (Src/cSIFT3D.cc:223-225).
# The vendored zlib is headers + a prebuilt win64 .lib; we compile against
# the vendored 1.2.11 headers (znzlib.h:63 hardcodes the relative path) and
# link the system libz (ABI-compatible).
set -euo pipefail
cd "$(dirname "$0")"

REF=/root/reference/3DSIFT
mkdir -p case/i build

SRCS=(
  "$REF/Src/cSIFT3D.cc"
  "$REF/Src/cUtil.cc"
  "$REF/Src/cMatcher.cc"
  "$REF/Src/Util/cTexImage.cc"
  "$REF/Src/Util/common.cpp"
  "$REF/Src/Util/matrixIO3D.cpp"
  "$REF/Src/Util/readNii.cpp"
  "$REF/3party/layNii/dep/nifti2_io.cpp"
  "$REF/3party/layNii/dep/znzlib.cpp"
  "$REF/3party/layNii/dep/laynii_lib.cpp"
  ref_driver.cpp
)

OBJS=()
for src in "${SRCS[@]}"; do
  obj="build/$(basename "$src" | sed 's/\.[^.]*$//').o"
  OBJS+=("$obj")
  if [ "$obj" -nt "$src" ] && [ "$obj" -nt msvc_compat.h ]; then
    continue
  fi
  echo "CXX $src"
  g++ -c -O2 -fopenmp -std=c++14 -w -fpermissive \
    -D'__declspec(x)=' -DCHECK_ENABLE \
    -include msvc_compat.h \
    -I "$REF" -I "$REF/Include" -I "$REF/3party/Eigen" \
    -I case/i \
    "$src" -o "$obj" &
done
wait

echo "LINK ref_driver"
g++ -fopenmp "${OBJS[@]}" -o ref_driver -lz
echo OK
