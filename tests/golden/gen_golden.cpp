// Golden-data generator for hesaff_tpu tests.
//
// Compiles against the READ-ONLY reference sources at /root/reference (the
// oracle) and dumps per-stage tensors + end-to-end outputs so each TPU stage
// can be unit-tested. This is test tooling only: it exercises the reference's
// public interfaces (HessianKeypointCallback / AffineShapeCallback,
// AffineShape::normalizeAffine, SIFTDescriptor) exactly the way the
// reference driver does (see /root/reference/hesaff.cpp:50-130).
//
// Build (see tests/golden/generate.py):
//   g++ -O3 -w -I shim -I /root/reference gen_golden.cpp \
//       /root/reference/pyramid.cpp /root/reference/helpers.cpp \
//       /root/reference/affine.cpp /root/reference/siftdesc.cpp \
//       $(pkg-config opencv4 --cflags --libs) -lrt -o gen_golden
//
// Usage: gen_golden image.ppm outdir num_stage_octaves [upscale]
//   upscale=1 sets PyramidParams.upscaleInputImage (pyramid.cpp:267-273,
//   doubleImage at helpers.cpp:297-329) for the 2x-input parity pack.

#include <cstdio>
#include <cstring>
#include <fstream>
#include <string>
#include <vector>

#include "pyramid.h"
#include "helpers.h"
#include "affine.h"
#include "siftdesc.h"

using namespace cv;
using namespace std;

static string g_outdir;
static FILE *g_manifest = nullptr;

static void dumpMat(const string &name, const Mat &m) {
  string fn = g_outdir + "/" + name + ".bin";
  FILE *f = fopen(fn.c_str(), "wb");
  for (int r = 0; r < m.rows; r++)
    fwrite(m.ptr<float>(r), sizeof(float), m.cols, f);
  fclose(f);
  fprintf(g_manifest, "%s f32 %d %d\n", name.c_str(), m.rows, m.cols);
}

static void dumpVec(const string &name, const vector<float> &v, int rows,
                    int cols) {
  string fn = g_outdir + "/" + name + ".bin";
  FILE *f = fopen(fn.c_str(), "wb");
  if (!v.empty()) fwrite(&v[0], sizeof(float), v.size(), f);
  fclose(f);
  fprintf(g_manifest, "%s f32 %d %d\n", name.c_str(), rows, cols);
}

// Intent-correct doubleImage. The reference's (helpers.cpp:297-329) is
// latent UB its default-off config never exercises: the flat input
// pointer advances cols-1 times per row (so row r reads flat[r*(cols-1)
// + c] — a progressive shear), `in[input.step]` indexes BYTES as
// floats (4 rows down for f32), and the last output row/col stay
// uninitialized.  Verified empirically: the dumped "doubled" plane
// equals flat[r*(cols-1)+c] at even-even sites, and back-to-back runs
// differ in keypoint count (101 vs 105) from the uninitialized border.
// Golden data for the upscale path therefore uses the evident intent —
// midpoint bilinear 2x with edge replication — matching SURVEY.md's
// rule for reference UB (zero-init/define, don't reproduce).
static Mat doubleImageFixed(const Mat &input) {
  Mat n(input.rows * 2, input.cols * 2, input.type());
  for (int r = 0; r < input.rows; r++) {
    int rn = r + 1 < input.rows ? r + 1 : input.rows - 1;
    for (int c = 0; c < input.cols; c++) {
      int cn = c + 1 < input.cols ? c + 1 : input.cols - 1;
      float v00 = input.at<float>(r, c), v01 = input.at<float>(r, cn);
      float v10 = input.at<float>(rn, c), v11 = input.at<float>(rn, cn);
      n.at<float>(2 * r, 2 * c) = v00;
      n.at<float>(2 * r, 2 * c + 1) = 0.5f * (v00 + v01);
      n.at<float>(2 * r + 1, 2 * c) = 0.5f * (v00 + v10);
      n.at<float>(2 * r + 1, 2 * c + 1) = 0.25f * (v00 + v01 + v10 + v11);
    }
  }
  return n;
}

// expose protected HessianDetector::hessianResponse for stage dumps
struct RespAccess : public HessianDetector {
  RespAccess(const PyramidParams &p) : HessianDetector(p) {}
  Mat resp(const Mat &in, float norm) { return hessianResponse(in, norm); }
};

// Replicates the pyramid schedule (pyramid.cpp:224-292) via the reference's
// own public helpers to dump blur levels and DoH responses per octave.
static void dumpPyramidStages(const Mat &gray, const PyramidParams &par,
                              int numOctaves) {
  RespAccess ra(par);
  float curSigma = 0.5f;
  Mat firstLevel;
  if (par.upscaleInputImage > 0) {  // pyramid.cpp:266-271, fixed resample
    firstLevel = doubleImageFixed(gray);
    curSigma *= 2.0f;
    dumpMat("doubled", firstLevel);
  } else {
    firstLevel = gray.clone();
  }
  if (par.initialSigma > curSigma) {
    float sigma = sqrt(par.initialSigma * par.initialSigma - curSigma * curSigma);
    gaussianBlurInplace(firstLevel, sigma);
  }
  dumpMat("firstLevel", firstLevel);

  float sigmaStep = pow(2.0f, 1.0f / (float)par.numberOfScales);
  int minSize = 2 * par.border + 2;
  int oct = 0;
  while (firstLevel.rows > minSize && firstLevel.cols > minSize &&
         oct < numOctaves) {
    char buf[64];
    Mat blur = firstLevel;
    float sig = par.initialSigma;
    Mat nextFirst;
    for (int i = 0; i <= par.numberOfScales + 1; i++) {
      snprintf(buf, sizeof buf, "oct%d_blur%d", oct, i);
      dumpMat(buf, blur);
      snprintf(buf, sizeof buf, "oct%d_resp%d", oct, i);
      dumpMat(buf, ra.resp(blur, sig * sig));
      if (i == par.numberOfScales) nextFirst = halfImage(blur);
      if (i < par.numberOfScales + 1) {
        float inc = sig * sqrt(sigmaStep * sigmaStep - 1.0f);
        blur = gaussianBlur(blur, inc);
        sig *= sigmaStep;
      }
    }
    firstLevel = nextFirst;
    oct++;
  }
}

struct GoldenDriver : public HessianDetector,
                      AffineShape,
                      HessianKeypointCallback,
                      AffineShapeCallback {
  const Mat image;
  SIFTDescriptor sift;
  vector<float> hessRecs;   // x,y,s,pd,type,resp
  vector<float> affRecs;    // x,y,s,pd,u11,u12,u21,u22,type,resp,iters
  vector<float> rectRecs;   // affIdx,a11,a12,a21,a22,normOk
  vector<float> patches;    // 41*41 per accepted keypoint
  vector<float> descs;      // 128 per accepted keypoint (quantized floats)
  vector<float> keys;       // x,y,s,a11,a12,a21,a22,resp,type + 128 desc
  int nAff = 0;

  GoldenDriver(const Mat &image, const PyramidParams &par,
               const AffineShapeParams &ap, const SIFTDescriptorParams &sp)
      : HessianDetector(par), AffineShape(ap), image(image), sift(sp) {
    setHessianKeypointCallback(this);
    setAffineShapeCallback(this);
  }

  void onHessianKeypointDetected(const Mat &blur, float x, float y, float s,
                                 float pixelDistance, int type,
                                 float response) {
    float rec[6] = {x, y, s, pixelDistance, (float)type, response};
    hessRecs.insert(hessRecs.end(), rec, rec + 6);
    findAffineShape(blur, x, y, s, pixelDistance, type, response);
  }

  void onAffineShapeFound(const Mat &blur, float x, float y, float s,
                          float pixelDistance, float a11, float a12, float a21,
                          float a22, int type, float response, int iters) {
    float rec[11] = {x,   y,   s,   pixelDistance, a11,  a12,
                     a21, a22, (float)type, response, (float)iters};
    affRecs.insert(affRecs.end(), rec, rec + 11);
    int affIdx = (int)(affRecs.size() / 11) - 1;

    rectifyAffineTransformationUpIsUp(a11, a12, a21, a22);
    bool failed = normalizeAffine(image, x, y, s, a11, a12, a21, a22);
    float rrec[6] = {(float)affIdx, a11, a12, a21, a22, failed ? 0.f : 1.f};
    rectRecs.insert(rectRecs.end(), rrec, rrec + 6);
    if (failed) return;

    for (int r = 0; r < patch.rows; r++)
      patches.insert(patches.end(), patch.ptr<float>(r),
                     patch.ptr<float>(r) + patch.cols);
    sift.computeSiftDescriptor(patch);
    descs.insert(descs.end(), sift.vec.begin(), sift.vec.end());

    float k[9] = {x, y, s, a11, a12, a21, a22, response, (float)type};
    keys.insert(keys.end(), k, k + 9);
    keys.insert(keys.end(), sift.vec.begin(), sift.vec.end());
    nAff++;
  }

  // mirrors detectPyramidKeypoints (pyramid.cpp:261-291) with the
  // intent-correct doubleImageFixed; detectOctaveKeypoints is the
  // reference's own (protected, reachable from this subclass)
  void detectPyramidKeypointsUpscaleFixed(const Mat &img) {
    float curSigma = 1.0f;          // 0.5 * 2 after upscale
    float pixelDistance = 0.5f;
    Mat firstLevel = doubleImageFixed(img);
    if (HessianDetector::par.initialSigma > curSigma) {
      float sigma = sqrt(HessianDetector::par.initialSigma *
                             HessianDetector::par.initialSigma -
                         curSigma * curSigma);
      gaussianBlurInplace(firstLevel, sigma);
    }
    int minSize = 2 * HessianDetector::par.border + 2;
    while (firstLevel.rows > minSize && firstLevel.cols > minSize) {
      Mat next;
      detectOctaveKeypoints(firstLevel, pixelDistance, next);
      pixelDistance *= 2.0f;
      firstLevel = next;
    }
  }

  // mirrors exportKeypoints (hesaff.cpp:107-130)
  void exportKeys(ostream &out) {
    out << 128 << endl;
    out << nAff << endl;
    int stride = 9 + 128;
    for (int i = 0; i < nAff; i++) {
      float *k = &keys[i * stride];
      float sc = AffineShape::par.mrSize * k[2];
      Mat A = (Mat_<float>(2, 2) << k[3], k[4], k[5], k[6]);
      SVD svd(A, SVD::FULL_UV);
      float *d = (float *)svd.w.data;
      d[0] = 1.0f / (d[0] * d[0] * sc * sc);
      d[1] = 1.0f / (d[1] * d[1] * sc * sc);
      A = svd.u * Mat::diag(svd.w) * svd.u.t();
      out << k[0] << " " << k[1] << " " << A.at<float>(0, 0) << " "
          << A.at<float>(0, 1) << " " << A.at<float>(1, 1);
      for (int j = 0; j < 128; j++) out << " " << int(k[9 + j]);
      out << endl;
    }
  }
};

int main(int argc, char **argv) {
  if (argc < 4) {
    printf("usage: gen_golden image.ppm outdir num_stage_octaves\n");
    return 1;
  }
  g_outdir = argv[2];
  int numStageOctaves = atoi(argv[3]);
  int upscale = argc > 4 ? atoi(argv[4]) : 0;
  g_manifest = fopen((g_outdir + "/manifest.txt").c_str(), "w");

  Mat tmp = imread(argv[1]);
  Mat image(tmp.rows, tmp.cols, CV_32FC1, Scalar(0));
  float *out = image.ptr<float>(0);
  unsigned char *in = tmp.ptr<unsigned char>(0);
  for (size_t i = tmp.rows * tmp.cols; i > 0; i--) {
    *out = (float(in[0]) + in[1] + in[2]) / 3.0f;
    out++;
    in += 3;
  }
  dumpMat("gray", image);

  PyramidParams p;
  p.threshold = 16.0f / 3.0f;
  p.upscaleInputImage = upscale;
  if (numStageOctaves > 0) dumpPyramidStages(image, p, numStageOctaves);

  AffineShapeParams ap;
  ap.maxIterations = 16;
  ap.patchSize = 41;
  ap.mrSize = 3.0f * sqrt(3.0f);
  SIFTDescriptorParams sp;
  sp.patchSize = 41;

  GoldenDriver drv(image, p, ap, sp);
  if (upscale)
    drv.detectPyramidKeypointsUpscaleFixed(image);
  else
    drv.detectPyramidKeypoints(image);

  dumpVec("hess_keypoints", drv.hessRecs, (int)(drv.hessRecs.size() / 6), 6);
  dumpVec("affine_shapes", drv.affRecs, (int)(drv.affRecs.size() / 11), 11);
  dumpVec("rect_norm", drv.rectRecs, (int)(drv.rectRecs.size() / 6), 6);
  dumpVec("patches", drv.patches, (int)(drv.patches.size() / (41 * 41)),
          41 * 41);
  dumpVec("descriptors", drv.descs, (int)(drv.descs.size() / 128), 128);
  dumpVec("final_keys", drv.keys, drv.nAff, 9 + 128);

  ofstream sout((g_outdir + "/out.hesaff.sift").c_str());
  drv.exportKeys(sout);

  fclose(g_manifest);
  printf("golden: %d hess, %d affine, %d final\n",
         (int)(drv.hessRecs.size() / 6), (int)(drv.affRecs.size() / 11),
         drv.nAff);
  return 0;
}
