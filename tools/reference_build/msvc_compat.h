/* MSVC -> POSIX compatibility shim for building the unmodified reference
 * (SCUT-CCNL/3DSIFT) with g++ on Linux.  Force-included via `-include` so
 * no reference file is touched.  Covers exactly the MSVC-isms present:
 *   - errno_t / sprintf_s / fopen_s  (Src/cUtil.cc:612-705 debug dumps)
 *   - __declspec(dllexport/dllimport) (Include/Util/common.h:4-8) is
 *     neutralised on the compiler command line with -D'__declspec(x)='
 *     (it cannot be shimmed here portably because common.h tokenises it).
 */
#ifndef SIFT3D_MSVC_COMPAT_H
#define SIFT3D_MSVC_COMPAT_H

#ifndef _MSC_VER

#include <cerrno>
#include <cfloat>   /* MSVC's <cstdio> chain provides FLT_EPSILON etc.
                       transitively; g++'s does not (cSIFT3D.cc:23 uses
                       FLT_EPSILON without including <cfloat>) */
#include <cmath>
#include <cstdio>

typedef int errno_t;

/* MSVC's array-deducing template overload: the reference only ever passes a
 * char array as the destination, so sizeof(buf) is the real capacity. */
#define sprintf_s(buf, ...) snprintf((buf), sizeof(buf), __VA_ARGS__)

static inline errno_t fopen_s(FILE **f, const char *name, const char *mode) {
    *f = fopen(name, mode);
    return *f ? 0 : errno;
}

#endif /* !_MSC_VER */
#endif /* SIFT3D_MSVC_COMPAT_H */
