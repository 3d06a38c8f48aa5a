// Reference CPU baseline at 100k atoms: same synthetic 20-half-neighbor
// pairwise-EDM workload as ref_bench.cpp, 10x atoms (2M pairs/step).
#include "edm_bias.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>
using namespace EDM;
using clk = std::chrono::high_resolution_clock;
int main(){
  FILE* f = fopen("/tmp/refbuild/bench100k.edm", "w");
  fprintf(f, "tempering 0\nhill_prefactor 0.1\nbias_per_step 1.0\nhill_density 250\n"
             "dimension 1\nbox_low 0\nbox_high 3.0\nbias_spacing 0.02\nbias_sigma 0.1\n"
             "hills_filename /tmp/refbuild/B100HILLS\n");
  fclose(f);
  EDMBias bias("/tmp/refbuild/bench100k.edm");
  bias.setup(1,1);
  double lo[]={0}, hi[]={3.0}; int p[]={0}; double skin[]={0};
  bias.subdivide(lo, hi, lo, hi, p, skin);
  const int natoms = 100000, nneigh = 20;
  const long npairs = (long)natoms*nneigh;
  std::vector<double> r(npairs);
  srand(77);
  for(long i=0;i<npairs;i++) r[i] = 0.9 + 2.0*(rand()/(double)RAND_MAX);
  long last_calls = npairs*2;
  const int stride = 10, nsteps = 20;
  double fbuf[1]; double energy=0;
  auto t0 = clk::now();
  for(int s=0;s<nsteps;s++){
    if(s % stride == 0) bias.pre_add_hill(last_calls);
    long ncalls = 0;
    for(long i=0;i<npairs;i++){
      fbuf[0]=0;
      energy += bias.update_force(&r[i], fbuf);
      if(s % stride == 0){
        bias.add_hill(&r[i], rand()/(double)RAND_MAX);
        bias.add_hill(&r[i], rand()/(double)RAND_MAX);
        ncalls += 2;
      }
    }
    if(s % stride == 0){ last_calls = ncalls; bias.post_add_hill(); }
  }
  auto t1 = clk::now();
  double secs = std::chrono::duration<double>(t1-t0).count();
  printf("pairwise_edm_100k: %d steps in %.3f s = %.3f steps/s (energy %.3f, cum %.3f)\n",
         nsteps, secs, nsteps/secs, energy, bias.cum_bias_);
  return 0;
}
