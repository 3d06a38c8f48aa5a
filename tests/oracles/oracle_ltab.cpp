// .ltab content oracle: DimmedGaussGrid<1>::multi_write with lammps format,
// single "rank" via the MPI stub (non-serial path, the one fix_edm_pair uses).
#include "gaussian_grid.h"
#include <cstdio>
using namespace EDM;
int main(){
  double min[]={0.0}, max_[]={3.0}, dx[]={0.0097}, sigma[]={0.1};
  int p[]={0};
  DimmedGaussGrid<1> g(min, max_, dx, p, 1 /*interpolate*/, sigma);
  g.set_boundary(min, max_, p);
  double x; 
  x=0.05;  g.add_value(&x, 0.7);   // boundary-corrected (McGDP) near left edge
  x=1.50;  g.add_value(&x, 1.0);   // interior
  x=2.37;  g.add_value(&x, 0.3);
  x=2.98;  g.add_value(&x, 0.5);   // near right edge
  g.lammps_multi_write("/tmp/refbuild/oracle.ltab");
  // also a shifted-box variant exercising the zero-fill rows (box_min > 0)
  double bmin2[]={0.5};
  DimmedGaussGrid<1> g2(bmin2, max_, dx, p, 1, sigma);
  g2.set_boundary(bmin2, max_, p);
  x=1.0;  g2.add_value(&x, 1.0);
  x=2.9;  g2.add_value(&x, 0.4);
  g2.lammps_multi_write("/tmp/refbuild/oracle2.ltab");
  printf("ok\n");
  return 0;
}
