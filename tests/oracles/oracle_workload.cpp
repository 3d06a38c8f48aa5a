// End-to-end engine oracle at MD-workload scale: replays a fix_edm_pair
// style hill sequence (500 pairs x 2 hills, 6 hill rounds) with heavy
// capping/deferral, dumping the exact inputs (r, uniforms) and outputs
// (cum_bias per round, probe values) for the replay test.
#include "edm_bias.h"
#include <cstdio>
#include <cstdlib>
#include <vector>
using namespace EDM;
int main(){
  FILE* f = fopen("/tmp/refbuild/wl.edm", "w");
  fprintf(f, "tempering 0\nhill_prefactor 10.0\nbias_per_step 1.0\nhill_density 250\n"
             "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\nbias_sigma 0.1\n"
             "hills_filename /tmp/refbuild/WLHILLS\n");
  fclose(f);
  EDMBias bias("/tmp/refbuild/wl.edm");
  bias.setup(1,1);
  double lo[]={0}, hi[]={3.0}; int p[]={0}; double skin[]={0};
  bias.subdivide(lo, hi, lo, hi, p, skin);
  const int npairs = 500;
  std::vector<double> r(npairs);
  srand(77);
  for(int i=0;i<npairs;i++) r[i] = 0.9 + 2.0*(rand()/(double)RAND_MAX);
  FILE* out = fopen("/tmp/refbuild/workload.txt", "w");
  fprintf(out, "R");
  for(int i=0;i<npairs;i++) fprintf(out, " %.17g", r[i]);
  fprintf(out, "\n");
  long last_calls = npairs*2;
  for(int round=0; round<6; round++){
    bias.pre_add_hill(last_calls);
    fprintf(out, "U");
    long ncalls=0;
    for(int i=0;i<npairs;i++){
      double u1 = rand()/(double)RAND_MAX, u2 = rand()/(double)RAND_MAX;
      fprintf(out, " %.17g %.17g", u1, u2);
      bias.add_hill(&r[i], u1);
      bias.add_hill(&r[i], u2);
      ncalls += 2;
    }
    fprintf(out, "\n");
    bias.post_add_hill();
    last_calls = ncalls;
    fprintf(out, "CUM %.12f\n", bias.cum_bias_);
  }
  fprintf(out, "PROBES");
  for(int k=0;k<=30;k++){
    double q = 0.05 + k*0.095;
    fprintf(out, " %.12f", bias.bias_->get_value(&q));
  }
  fprintf(out, "\n");
  fclose(out);
  printf("cum=%.12f\n", bias.cum_bias_);
  return 0;
}
