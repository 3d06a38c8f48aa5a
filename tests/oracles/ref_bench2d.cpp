// Reference CPU baseline: 2-D coordinate EDM under heavy hill load
// (1e6-point grid, bias_per_step capping) — SURVEY config 4 analog.
#include "edm_bias.h"
#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>
using namespace EDM;
using clk = std::chrono::high_resolution_clock;
int main(){
  FILE* f = fopen("/tmp/refbuild/bench2d.edm", "w");
  fprintf(f, "tempering 0\nhill_prefactor 0.1\nbias_per_step 1.0\nhill_density 250\n"
             "dimension 2\nbox_low 0 0\nbox_high 10 10\n"
             "bias_spacing 0.01 0.01\nbias_sigma 0.05 0.05\n"
             "hills_filename /tmp/refbuild/B2DHILLS\n");
  fclose(f);
  EDMBias bias("/tmp/refbuild/bench2d.edm");
  bias.setup(1,1);
  double lo[]={0,0}, hi[]={10,10}; int p[]={1,1}; double skin[]={0,0};
  bias.subdivide(lo, hi, lo, hi, p, skin);
  const int natoms = 10000;
  std::vector<double> xy(natoms*2);
  srand(77);
  for(int i=0;i<natoms*2;i++) xy[i] = 10.0*(rand()/(double)RAND_MAX);
  long last_calls = natoms;
  const int stride = 10, nsteps = 20;
  double fbuf[2]; double energy=0;
  auto t0 = clk::now();
  for(int s=0;s<nsteps;s++){
    if(s % stride == 0) bias.pre_add_hill(last_calls);
    for(int i=0;i<natoms;i++){
      fbuf[0]=fbuf[1]=0;
      energy += bias.update_force(&xy[2*i], fbuf);
      if(s % stride == 0)
        bias.add_hill(&xy[2*i], rand()/(double)RAND_MAX);
    }
    if(s % stride == 0){ last_calls = natoms; bias.post_add_hill(); }
  }
  auto t1 = clk::now();
  double secs = std::chrono::duration<double>(t1-t0).count();
  printf("coord2d_10k_1e6grid: %d steps in %.3f s = %.3f steps/s (energy %.3f, cum %.4f)\n",
         nsteps, secs, nsteps/secs, energy, bias.cum_bias_);
  return 0;
}
