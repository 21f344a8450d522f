// Ground-truth driver for the unmodified C++ reference (SCUT-CCNL/3DSIFT).
//
// Mirrors Example.cpp's read -> extract -> enhancedMatch flow
// (/root/reference/3DSIFT/Example.cpp:8-64) but dumps every intermediate to
// binary files so the TPU pipeline and the NumPy oracle can be diffed
// against the *actual* reference, not a re-implementation of it:
//   - GSS / DoG pyramid levels        (GET_GSS/GET_DOG, Include/cSIFT3D.h:169-177,
//                                      alive because the build defines CHECK_ENABLE)
//   - raw per-level detections        (GET_LEVEL -> level_extrema)
//   - surviving keypoints w/ rotation + 768-D descriptor (GetKeypoints)
//   - enhancedMatch coordinate pairs
//   - per-stage timers (m_timer / matcher phase timers)
//
// Usage: ref_driver ref.nii[.gz] tar.nii[.gz] outdir [nthreads] [--pyramids]
//
// Binary formats (little-endian):
//   volume .bin   : int32 ndim, int32 dims[ndim] (z,y,x), float32 data (row-major z,y,x)
//   keypoints .bin: int32 count, per kp: float32[7] {x,y,z,scale,rx,ry,rz},
//                   int32[2] {octave,level}, float32[9] Rotation, float32[768] desc
//   detections.bin: int32 nlevels, per level: int32[3] {octave,level,count},
//                   int32 count*3 (x,y,z)
//   matches .bin  : int32 count, float32 count*6 (ref xyz, tar xyz)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include "Include/cSIFT3D.h"
#include "Include/cMatcher.h"
#include "Include/Util/readNii.h"

using namespace CPUSIFT;

static void write_volume(const std::string &path, TexImage &im) {
    FILE *f = fopen(path.c_str(), "wb");
    if (!f) { perror(path.c_str()); exit(1); }
    int ndim = 3;
    int dims[3] = {im.GetDimZ(), im.GetDimY(), im.GetDimX()};
    fwrite(&ndim, 4, 1, f);
    fwrite(dims, 4, 3, f);
    // _Data is contiguous with xs=1, ys=nx, zs=nx*ny: already z,y,x row-major
    fwrite(im._Data, 4, (size_t)dims[0] * dims[1] * dims[2], f);
    fclose(f);
}

static void write_keypoints(const std::string &path,
                            const std::vector<Keypoint> &kps) {
    FILE *f = fopen(path.c_str(), "wb");
    if (!f) { perror(path.c_str()); exit(1); }
    int n = (int)kps.size();
    fwrite(&n, 4, 1, f);
    for (const Keypoint &k : kps) {
        float head[7] = {k.x, k.y, k.z, k.scale, k.rx, k.ry, k.rz};
        int oi[2] = {k.octave, k.level};
        fwrite(head, 4, 7, f);
        fwrite(oi, 4, 2, f);
        fwrite(k.Rotation, 4, 9, f);
        fwrite(k.desc, 4, DESC_NUMEL, f);
    }
    fclose(f);
}

static void write_detections(const std::string &path,
                             std::vector<std::vector<Keypoint> > &levels,
                             int dog_interval) {
    FILE *f = fopen(path.c_str(), "wb");
    if (!f) { perror(path.c_str()); exit(1); }
    int n = (int)levels.size();
    fwrite(&n, 4, 1, f);
    // level_extrema is appended once per (octave, inner level) in detection
    // order (Src/cSIFT3D.cc:373-419): i runs 1..dog_interval-2 per octave.
    int inner = dog_interval - 2;
    for (int li = 0; li < n; ++li) {
        int hdr[3] = {li / inner, 1 + li % inner, (int)levels[li].size()};
        fwrite(hdr, 4, 3, f);
        for (const Keypoint &k : levels[li]) {
            int xyz[3] = {(int)k.x, (int)k.y, (int)k.z};
            fwrite(xyz, 4, 3, f);
        }
    }
    fclose(f);
}

static void write_matches(const std::string &path,
                          const std::vector<Cvec> &ref,
                          const std::vector<Cvec> &tar) {
    FILE *f = fopen(path.c_str(), "wb");
    if (!f) { perror(path.c_str()); exit(1); }
    int n = (int)ref.size();
    fwrite(&n, 4, 1, f);
    for (int i = 0; i < n; ++i) {
        float row[6] = {ref[i].x, ref[i].y, ref[i].z,
                        tar[i].x, tar[i].y, tar[i].z};
        fwrite(row, 4, 6, f);
    }
    fclose(f);
}

static CSIFT3D *extract(const char *nii_path, const std::string &outdir,
                        const std::string &tag, bool dump_pyramids,
                        std::vector<Keypoint> &kps_out) {
    int nx = 0, ny = 0, nz = 0;
    float *vol = readNiiFile(nii_path, nx, ny, nz);
    if (!vol) { fprintf(stderr, "failed to read %s\n", nii_path); exit(1); }
    printf("[%s] dims %d %d %d\n", tag.c_str(), nx, ny, nz);

    CSIFT3D *sift = CSIFT3DFactory::CreateCSIFT3D(vol, nx, ny, nz);
    sift->KpSiftAlgorithm();
    kps_out = sift->GetKeypoints();

    write_keypoints(outdir + "/keypoints_" + tag + ".bin", kps_out);
    int dog_interval = NUM_KP_LEVELS + 2;
    write_detections(outdir + "/detections_" + tag + ".bin",
                     *sift->GET_LEVEL(), dog_interval);
    if (dump_pyramids) {
        std::vector<TexImage> &gss = *sift->GET_GSS();
        std::vector<TexImage> &dog = *sift->GET_DOG();
        char name[256];
        for (size_t i = 0; i < gss.size(); ++i) {
            int o = (int)i / (NUM_KP_LEVELS + 3), s = (int)i % (NUM_KP_LEVELS + 3);
            snprintf(name, sizeof(name), "/gss_%s_o%d_l%d.bin", tag.c_str(), o, s);
            write_volume(outdir + name, gss[i]);
        }
        for (size_t i = 0; i < dog.size(); ++i) {
            int o = (int)i / dog_interval, s = (int)i % dog_interval;
            snprintf(name, sizeof(name), "/dog_%s_o%d_l%d.bin", tag.c_str(), o, s);
            write_volume(outdir + name, dog[i]);
        }
    }
    printf("[%s] timers: alloc=%.3f gss=%.3f dog=%.3f detect=%.3f orient=%.3f "
           "desc=%.3f release=%.3f\n",
           tag.c_str(), sift->m_timer.d_Allocation, sift->m_timer.d_BuildGSS,
           sift->m_timer.d_BuildDOG, sift->m_timer.d_Detect,
           sift->m_timer.d_AssignOrientation, sift->m_timer.d_Extraction,
           sift->m_timer.d_release);
    delete[] vol;
    return sift;  // caller keeps it alive: kps_out[i].desc points into it
}

int main(int argc, char **argv) {
    if (argc < 4) {
        fprintf(stderr,
                "usage: %s ref.nii tar.nii outdir [nthreads] [--pyramids]\n",
                argv[0]);
        return 2;
    }
    std::string outdir = argv[3];
    bool dump_pyramids = false;
    int nthreads = 0;
    for (int i = 4; i < argc; ++i) {
        if (!strcmp(argv[i], "--pyramids")) dump_pyramids = true;
        else nthreads = atoi(argv[i]);
    }
    if (nthreads > 0) sift_thread_num = nthreads;

    std::vector<Keypoint> ref_kps, tar_kps;
    CSIFT3D *sr = extract(argv[1], outdir, "ref", dump_pyramids, ref_kps);
    CSIFT3D *st = extract(argv[2], outdir, "tar", dump_pyramids, tar_kps);

    muBruteMatcher matcher;
    std::vector<Cvec> mref, mtar;
    matcher.enhancedMatch(mref, mtar, ref_kps, tar_kps, 0.85);
    write_matches(outdir + "/matches.bin", mref, mtar);
    printf("ref_kps=%zu tar_kps=%zu matches=%zu\n",
           ref_kps.size(), tar_kps.size(), mref.size());
    // muBruteMatcher's phase counters are omp_get_wtime() differences,
    // i.e. seconds (Src/cMatcher.cc:163-213).
    printf("match timers: match=%.3f filter=%.3f count=%.3f rev=%.3f "
           "revFilter=%.3f biject=%.3f total=%.3f (s)\n",
           matcher.matchTime, matcher.filterTime, matcher.countMatchedTime,
           matcher.revMatchTime, matcher.revFilterTime,
           matcher.bijectFilterTime, matcher.totalTime);

    delete sr;
    delete st;
    return 0;
}
