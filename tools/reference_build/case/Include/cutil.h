/* Case shim: Src/cSIFT3D.cc includes "../Include/cutil.h" (lowercase),
 * which resolves on Windows' case-insensitive filesystem but not here.
 * The build adds `-I tools/reference_build/case/i`, so the quoted include
 * "../Include/cutil.h" lands on this file, which forwards to the real
 * header via the -I /root/reference/3DSIFT/Include search path. */
#include "cUtil.h"
