// Spatial-subdivision oracle: true sub-box + skin, out-of-bounds replica,
// and deposits with centers inside / in-skin / outside the local grid.
#include "edm_bias.h"
#include <cstdio>
using namespace EDM;
int main(){
  FILE* f = fopen("/tmp/refbuild/sub.edm", "w");
  fprintf(f, "tempering 0\nhill_prefactor 1.0\ndimension 1\n"
             "box_low 0\nbox_high 10\nbias_spacing 0.0097\nbias_sigma 0.2\n"
             "hills_filename /tmp/refbuild/SUBHILLS\n");
  fclose(f);
  { // rank owning [2.5, 5.0] of a periodic [0,10] box, skin 0.35
    EDMBias bias("/tmp/refbuild/sub.edm");
    bias.setup(1,1);
    double sublo[]={2.5}, subhi[]={5.0}, boxlo[]={0}, boxhi[]={10};
    int p[]={1}; double skin[]={0.35};
    bias.subdivide(sublo, subhi, boxlo, boxhi, p, skin);
    printf("outofbounds=%d\n", (int)bias.b_outofbounds_);
    // grid geometry: write then read back the header via the file
    bias.write_bias("/tmp/refbuild/SUBBIAS");
    // deposits (do_add_hill direct via add_hills rounds of single hills)
    double xs[4] = {3.7,   // interior
                    2.3,   // in the skin (inside local grid, outside sub-box)
                    5.55,  // outside local grid, support overlaps edge
                    8.0};  // far away - no overlap
    for(int i=0;i<4;i++){
      double* pos[1] = {&xs[i]}; double ru[1]={1.0};
      double before = bias.cum_bias_;
      bias.add_hills(1, (const double* const*)pos, ru);
      printf("hill %.2f added=%.12f\n", xs[i], bias.cum_bias_ - before);
    }
    double q[1], der[1];
    double pts[] = {2.2, 2.5, 3.7, 5.0, 5.3};
    for(int i=0;i<5;i++){
      q[0]=pts[i];
      double v = bias.bias_->get_value_deriv(q, der);
      printf("v(%.2f)=%.12f der=%.12f\n", pts[i], v, der[0]);
    }
    printf("cum=%.12f totalvol=%.12f\n", bias.cum_bias_, bias.total_volume_);
  }
  { // out-of-bounds rank: sub-box outside the CV range
    FILE* g = fopen("/tmp/refbuild/sub2.edm", "w");
    fprintf(g, "tempering 0\nhill_prefactor 1.0\ndimension 1\n"
               "box_low 0\nbox_high 4\nbias_spacing 0.0097\nbias_sigma 0.2\n"
               "hills_filename /tmp/refbuild/SUB2HILLS\n");
    fclose(g);
    EDMBias bias("/tmp/refbuild/sub2.edm");
    bias.setup(1,1);
    double sublo[]={6.0}, subhi[]={8.0}, boxlo[]={0}, boxhi[]={10};
    int p[]={1}; double skin[]={0.35};
    bias.subdivide(sublo, subhi, boxlo, boxhi, p, skin);
    printf("oob outofbounds=%d\n", (int)bias.b_outofbounds_);
    double q[]={7.0}, fbuf[]={0.0};
    double e = bias.update_force(q, fbuf);
    printf("oob e=%.12f f=%.12f\n", e, fbuf[0]);
    double* pos[1]={q}; double ru[1]={1.0};
    bias.add_hills(1, (const double* const*)pos, ru);
    printf("oob cum=%.12f\n", bias.cum_bias_);
  }
  return 0;
}
