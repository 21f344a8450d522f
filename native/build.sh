#!/bin/sh
# Build the native extensions in-place into sift3d_tpu/io/.
set -e
cd "$(dirname "$0")"
PYINC=$(python -c "import sysconfig; print(sysconfig.get_paths()['include'])")
EXT=$(python -c "import sysconfig; print(sysconfig.get_config_var('EXT_SUFFIX'))")
g++ -O2 -shared -fPIC -std=c++17 -I"$PYINC" nifti_reader.cc -lz \
    -o "../sift3d_tpu/io/_nifti_native$EXT"
echo "built sift3d_tpu/io/_nifti_native$EXT"
g++ -O3 -march=native -fopenmp -std=c++17 cpu_baseline.cc -o cpu_baseline
echo "built native/cpu_baseline"
