import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time, sys
from duckdb_cubit_tpu.api import connect
t0=time.time(); conn = connect(sf=1.0); print('load', round(time.time()-t0,1), flush=True)
from duckdb_cubit_tpu.tpch import answers
qdir='/root/reference/extension/tpch/dbgen/queries'
for n in [int(x) for x in sys.argv[1:]]:
    sql=open(f'{qdir}/q{n:02d}.sql').read()
    t0=time.time(); r=conn.sql(sql); rows=r.strings(); t1=time.time()-t0
    t0=time.time(); r=conn.sql(sql); rows=r.strings(); t2=time.time()-t0
    ok = not answers.compare(rows, 1.0, n)
    print(f'q{n:02d} {"PASS" if ok else "FAIL"} first={t1:8.1f}s steady={t2:7.3f}s', flush=True)
