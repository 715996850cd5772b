/* Minimal Silo API stub so the reference solver (/root/reference/main.c,
 * which includes <silo.h> and calls DBCreate/DBPutQuadmesh/DBPutQuadvar1/
 * DBPutDefvars/DBClose at main.c:550-598) compiles without LLNL Silo.
 *
 * Instead of a .silo database, DBPutQuadvar1 dumps each variable as raw
 * binary next to the would-be file: "<silofile>.<var>.bin" containing
 * int32 ndims, int32 dims[ndims], then float64 data (i fastest — the
 * reference's idx() layout, main.c:374-380).  Used by
 * tests/test_golden_c.py to produce golden fields from the compiled C
 * reference itself.
 */
#ifndef SILO_STUB_H
#define SILO_STUB_H

#define DB_CLOBBER 0
#define DB_LOCAL 0
#define DB_PDB 2
#define DB_DOUBLE 20
#define DB_COLLINEAR 130
#define DB_ZONECENT 111
#define DB_VARTYPE_VECTOR 1

typedef struct DBfile_stub {
    char filename[1024];
} DBfile;

DBfile *DBCreate(const char *name, int mode, int target, const char *info,
                 int type);
int DBPutQuadmesh(DBfile *db, const char *name, char **coordnames,
                  double **coords, int *dims, int ndims, int datatype,
                  int coordtype, void *optlist);
int DBPutQuadvar1(DBfile *db, const char *name, const char *meshname,
                  double *vals, int *dims, int ndims, void *mixvals,
                  int mixlen, int datatype, int centering, void *optlist);
int DBPutDefvars(DBfile *db, const char *name, int ndefs, const char **names,
                 const int *types, const char **defs, void *optlist);
int DBClose(DBfile *db);

#endif /* SILO_STUB_H */
