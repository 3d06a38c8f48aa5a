/* Single-rank MPI stub for compiling the reference library serially as a
 * test oracle (the reference includes mpi.h unconditionally, grid.h:10,
 * even under -DEDM_SERIAL).  Implements just the calls the reference
 * makes (SURVEY.md section 2 "Distributed communication backend"), with
 * single-rank semantics: rank 0, size 1, reductions copy send -> recv.
 * This is test scaffolding, not shipped code. */
#ifndef EDM_TPU_MPI_STUB_H
#define EDM_TPU_MPI_STUB_H

#include <string.h>

typedef int MPI_Comm;
typedef int MPI_Datatype;
typedef int MPI_Op;
typedef int MPI_Request;
typedef struct {
  int MPI_SOURCE, MPI_TAG, MPI_ERROR;
} MPI_Status;

#define MPI_COMM_WORLD 0
#define MPI_STATUS_IGNORE ((MPI_Status *)0)
#define MPI_IN_PLACE ((void *)1)

#define MPI_CHAR 1
#define MPI_INT 4
#define MPI_UNSIGNED 5
#define MPI_LONG 8
#define MPI_DOUBLE 9

#define MPI_SUM 0
#define MPI_MAX 1
#define MPI_MIN 2
#define MPI_LOR 3

static inline int MPI_stub_sizeof(MPI_Datatype t) {
  switch (t) {
    case MPI_CHAR: return 1;
    case MPI_INT: return 4;
    case MPI_UNSIGNED: return 4;
    case MPI_LONG: return 8;
    case MPI_DOUBLE: return 8;
  }
  return 8;
}

static inline int MPI_Comm_rank(MPI_Comm c, int *rank) {
  (void)c; *rank = 0; return 0;
}
static inline int MPI_Comm_size(MPI_Comm c, int *size) {
  (void)c; *size = 1; return 0;
}
static inline int MPI_Allreduce(const void *send, void *recv, int count,
                                MPI_Datatype t, MPI_Op op, MPI_Comm c) {
  (void)op; (void)c;
  if (send != MPI_IN_PLACE && send != recv)
    memcpy(recv, send, (size_t)count * MPI_stub_sizeof(t));
  return 0;
}
static inline int MPI_Bcast(void *buf, int count, MPI_Datatype t, int root,
                            MPI_Comm c) {
  (void)buf; (void)count; (void)t; (void)root; (void)c; return 0;
}
static inline int MPI_Barrier(MPI_Comm c) { (void)c; return 0; }
static inline int MPI_Isend(const void *buf, int count, MPI_Datatype t,
                            int dest, int tag, MPI_Comm c, MPI_Request *r) {
  (void)buf; (void)count; (void)t; (void)dest; (void)tag; (void)c;
  *r = 0; return 0;
}
static inline int MPI_Recv(void *buf, int count, MPI_Datatype t, int src,
                           int tag, MPI_Comm c, MPI_Status *s) {
  (void)buf; (void)count; (void)t; (void)src; (void)tag; (void)c; (void)s;
  return 0;
}
static inline int MPI_Wait(MPI_Request *r, MPI_Status *s) {
  (void)r; (void)s; return 0;
}
static inline int MPI_Gather(const void *send, int scount, MPI_Datatype st,
                             void *recv, int rcount, MPI_Datatype rt,
                             int root, MPI_Comm c) {
  (void)rcount; (void)rt; (void)root; (void)c;
  if (send != MPI_IN_PLACE && send != recv)
    memcpy(recv, send, (size_t)scount * MPI_stub_sizeof(st));
  return 0;
}
static inline int MPI_Scatter(const void *send, int scount, MPI_Datatype st,
                              void *recv, int rcount, MPI_Datatype rt,
                              int root, MPI_Comm c) {
  (void)rcount; (void)rt; (void)root; (void)c;
  if (send != MPI_IN_PLACE && send != recv)
    memcpy(recv, send, (size_t)scount * MPI_stub_sizeof(st));
  return 0;
}

#endif /* EDM_TPU_MPI_STUB_H */
