import duckdb, json, glob, sys, math
outdir = sys.argv[1] if len(sys.argv)>1 else '/tmp/verify_out'
sfdir = sys.argv[2] if len(sys.argv)>2 else '/root/testdata/sf0.001'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"create view {t} as select * from '{sfdir}/{t}.parquet'")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
for name, sql in sorted(oracle.items()):
    try:
        got = con.execute(f"select * from read_parquet('{outdir}/{name}/*.parquet')").fetchdf()
        exp = con.execute(sql).fetchdf()
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"{name}: SCHEMA MISMATCH got={list(got.columns)} exp={list(exp.columns)}"); continue
        g = sorted(map(repr, got.itertuples(index=False)))
        e = sorted(map(repr, exp.itertuples(index=False)))
        if len(g)!=len(e): print(f"{name}: ROWCOUNT got={len(g)} exp={len(e)}")
        elif g!=e:
            bad = [(a,b) for a,b in zip(g,e) if a!=b][:3]
            print(f"{name}: VALUE MISMATCH e.g. {bad}")
        else: print(f"{name}: OK ({len(g)} rows)")
    except Exception as ex:
        print(f"{name}: ERROR {ex}")
