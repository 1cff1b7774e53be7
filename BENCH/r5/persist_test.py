import json, os, sys, tempfile, time
sys.path.insert(0, '/root/repo')
os.environ.setdefault('TMPDIR','/dev/shm')
import bench  # for tree_cpu_split
from milvus_cdc_spark.session import get_spark
from milvus_cdc_spark.plans.apply import ReplicateJob, generated_source
from milvus_cdc_spark.plans.metastore import Metastore

spark = get_spark(app_name='persist_test', master='local[4]')
work = tempfile.mkdtemp(prefix='cdc_persist_', dir='/dev/shm')
N = 5*8_000_000 + 2_000_000
job = ReplicateJob(spark=spark, source=generated_source(num_keys=400_000, content_repeat=8),
    table_root=os.path.join(work,'tbl'), metastore=Metastore(os.path.join(work,'meta')),
    batch_size=2_000_000, num_buckets=32, collect_metrics=True, log_max_seq=N-1)
job.run(until_seq=N-1, max_batches=1)  # warm
job.batch_size = 8_000_000
for i in range(5):
    u0,s0 = bench.tree_cpu_split(); t0=time.time()
    r = job.run(until_seq=N-1, max_batches=1)
    dt = time.time()-t0; u1,s1 = bench.tree_cpu_split()
    print(json.dumps({'batch':i,'eps':round(r['events_applied']/dt,0),'wall':round(dt,1),'ut':round(u1-u0,1),'st':round(s1-s0,1)}), flush=True)
import shutil; shutil.rmtree(work, ignore_errors=True)
