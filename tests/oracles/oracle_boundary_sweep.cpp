// Boundary-sweep oracle: the reference's hill_design LAMMPS demo
// (/root/reference/algorithms/hill_design/lammps_test/lammps.in) drives
// `fix edm` through 7 single-hill deposits walking x = 2..8 across a
// NON-PERIODIC [2, 8] box (test.edm: sigma 0.5, spacing 0.01) — each
// iteration a fresh fix deposits ONE hill and writes the grid, so the
// hills at x=2 and x=8 sit exactly ON the McGovern-De Pablo boundary and
// the ones within ~4*sigma*sqrt(2) of it exercise the boundary
// correction + zero-force duplication (gaussian_grid.h:504-541).
//
// This generator replays that demo on the reference library and records,
// per hill position: cum_bias and interpolated value/derivative probes on
// a lattice hugging both boundaries, as a committed fixture for
// tests/test_boundary_sweep.py (which drives the SAME demo through
// api.EDMBias — the external-host surface).
//
// Build (see tests/oracles/README.md):
//   g++ -O2 -std=c++11 -DEDM_SERIAL -I tests/oracles/mpi_stub \
//       -I /root/reference/lib tests/oracles/oracle_boundary_sweep.cpp \
//       /root/reference/lib/{grid,gaussian_grid,edm_bias,edm}.cpp \
//       -o /tmp/refbuild/oracle_boundary_sweep
//   /tmp/refbuild/oracle_boundary_sweep tests/oracles/boundary_sweep.txt
#include "edm_bias.h"
#include <cmath>
#include <cstdio>
#include <string>

int main(int argc, char** argv) {
  if (argc < 2) { fprintf(stderr, "usage: oracle_boundary_sweep <out>\n"); return 1; }

  // test.edm from the demo, verbatim (hills_filename added for the lib)
  std::string edm =
      "tempering 0\nbias_per_step 1000.0\nhill_prefactor 1.0\ndimension 1\n"
      "box_low 2\nbox_high 8\nbias_spacing 0.01\nbias_sigma 0.5\n"
      "hills_filename /tmp/refbuild/BSWHILLS\n";
  std::string epath = "/tmp/refbuild/bsweep.edm";
  FILE* f = fopen(epath.c_str(), "w");
  fputs(edm.c_str(), f);
  fclose(f);

  FILE* out = fopen(argv[1], "w");
  if (!out) { fprintf(stderr, "cannot open %s\n", argv[1]); return 1; }
  fprintf(out, "NAME boundary_sweep\n");

  double lo[3] = {2, 0, 0}, hi[3] = {8, 0, 0}, skin[3] = {0, 0, 0};
  int per[3] = {0, 0, 0};
  const int NP = 61;  // probes cluster near both boundaries
  for (int i = 0; i < 7; i++) {
    double x = 2.0 + i;  // the demo's displace_atoms walk: 2, 3, ..., 8
    EDM::EDMBias bias(epath);  // fresh fix each loop iteration
    bias.setup(1.0, 1.0);
    bias.subdivide(lo, hi, lo, hi, per, skin);
    bias.pre_add_hill(1);
    bias.add_hill(&x, 0.5);
    bias.post_add_hill();
    fprintf(out, "HILL %.17g\nCUM %.15g\nPROBES %d\n", x, bias.cum_bias_, NP);
    for (int k = 0; k < NP; k++) {
      // denser near the edges: monotone sine-stretched lattice on [2, 8]
      // (ds/dt = 1 - 0.8 cos(2 pi t) >= 0.2, s(0)=0, s(1)=1)
      double t = (double)k / (NP - 1);               // 0..1
      double s = t - 0.8 * sin(2 * M_PI * t) / (2 * M_PI);
      double q = 2.0 + 6.0 * s;
      double der[3] = {0, 0, 0};
      double v = bias.bias_->get_value_deriv(&q, der);
      fprintf(out, "P %.17g %.15g %.15g\n", q, v, der[0]);
    }
  }
  fprintf(out, "END\n");
  fclose(out);
  printf("boundary sweep fixture written\n");
  return 0;
}
