"""Co-scheduling-floor probe (BASELINE round 5, VERDICT item 5).

Measures per-task inflation of the extract kernel at 1/4/16 concurrent
copies (fork pool, steal traced).  Pair with a pure-compute loop and a
memory-streaming kernel to attribute a scaling ceiling: if the kernel's
4v16 inflation matches the pure-compute loop's, the ceiling is the
machine's co-scheduling floor (frequency/topology of the shared vCPU
slice), not memory traffic — byte-reduction in the C lane cannot move
it.  Round-5 readings: pure-compute 1.21x, extract kernel 1.27x at
0.00-0.05% steal — the kernel sits at the floor.
"""

import multiprocessing as mp, time, sys
sys.path.insert(0, "/root/repo")

def kernel_probe(_):
    from nipper_ray.stages.extract import ExtractStage
    import pyarrow as pa, pyarrow.parquet as pq
    from nipper_ray.sources.synth import gen_page_html
    t = pq.read_table("/root/testdata/sf0.01/documents.parquet", columns=["doc_id","text"])
    pages = [gen_page_html(i, t.column("text")[i % 500].as_py(), 500) for i in range(200)]
    stage = ExtractStage(keep_cols=())
    batch = pa.table({"html": pa.array(pages * 5, pa.string())})
    stage(batch)  # warm
    t0 = time.perf_counter()
    for _ in range(15):
        stage(batch)
    return (time.perf_counter() - t0) / 15

def steal():
    v=[int(x) for x in open("/proc/stat").readline().split()[1:9]]; return v[7], sum(v)

def run(n):
    ctx = mp.get_context("fork")
    with ctx.Pool(n) as p:
        p.map(kernel_probe, range(n))
        s0,j0 = steal()
        r = p.map(kernel_probe, range(n))
        s1,j1 = steal()
    return sum(r)/len(r), round(100*(s1-s0)/max(1,j1-j0),2)

if __name__ == "__main__":
    # preload the C modules in the parent so forks inherit them warm
    kernel_probe(0)
    base, st1 = run(1)
    print("extract-kernel n= 1 avg_task=%.3fs steal=%.2f%%" % (base, st1))
    for n in (4, 16, 4, 16, 4, 16):
        avg, st = run(n)
        print("extract-kernel n=%2d avg_task=%.3fs inflation=%.2fx steal=%.2f%%" % (n, avg, avg/base, st))
