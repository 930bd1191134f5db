import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time, jax
from duckdb_cubit_tpu.api import connect
conn = connect(sf=1.0)
qdir='/root/reference/extension/tpch/dbgen/queries'
sql=open(f'{qdir}/q03.sql').read()
r=conn.sql(sql); r.strings()   # compile
t0=time.time(); r=conn.sql(sql); r.strings(); print('steady', time.time()-t0, flush=True)
with jax.profiler.trace('/tmp/jaxtrace'):
    r=conn.sql(sql); r.strings()
print('traced', flush=True)
