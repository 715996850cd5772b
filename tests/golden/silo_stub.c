/* Implementation of the Silo stub (see silo.h in this directory). */
#include "silo.h"

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

DBfile *DBCreate(const char *name, int mode, int target, const char *info,
                 int type) {
    (void)mode;
    (void)target;
    (void)info;
    (void)type;
    DBfile *db = (DBfile *)malloc(sizeof(DBfile));
    if (!db) return NULL;
    snprintf(db->filename, sizeof(db->filename), "%s", name);
    return db;
}

int DBPutQuadmesh(DBfile *db, const char *name, char **coordnames,
                  double **coords, int *dims, int ndims, int datatype,
                  int coordtype, void *optlist) {
    (void)db;
    (void)name;
    (void)coordnames;
    (void)coords;
    (void)dims;
    (void)ndims;
    (void)datatype;
    (void)coordtype;
    (void)optlist;
    return 0;
}

int DBPutQuadvar1(DBfile *db, const char *name, const char *meshname,
                  double *vals, int *dims, int ndims, void *mixvals,
                  int mixlen, int datatype, int centering, void *optlist) {
    (void)meshname;
    (void)mixvals;
    (void)mixlen;
    (void)datatype;
    (void)centering;
    (void)optlist;
    char path[1200];
    snprintf(path, sizeof(path), "%s.%s.bin", db->filename, name);
    FILE *f = fopen(path, "wb");
    if (!f) {
        perror(path);
        exit(1);
    }
    long n = 1;
    int i;
    int nd = ndims;
    fwrite(&nd, sizeof(int), 1, f);
    for (i = 0; i < ndims; ++i) {
        fwrite(&dims[i], sizeof(int), 1, f);
        n *= dims[i];
    }
    fwrite(vals, sizeof(double), (size_t)n, f);
    fclose(f);
    return 0;
}

int DBPutDefvars(DBfile *db, const char *name, int ndefs, const char **names,
                 const int *types, const char **defs, void *optlist) {
    (void)db;
    (void)name;
    (void)ndefs;
    (void)names;
    (void)types;
    (void)defs;
    (void)optlist;
    return 0;
}

int DBClose(DBfile *db) {
    free(db);
    return 0;
}
