import json, sys, time, urllib.request
sys.path.insert(0, "/root/repo")
from praw_etl_student_dropout_spark.session import get_spark
from praw_etl_student_dropout_spark.plans import catalog_all
from praw_etl_student_dropout_spark.sources.readers import load_tables

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="r15_shuffle_bytes", extra_conf={"spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
load_tables(spark, SF)
reg = catalog_all()
sc = spark.sparkContext
ui = sc.uiWebUrl
app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

def shuffle_bytes(name):
    group = f"sb-{name}"
    sc.setJobGroup(group, name)
    reg[name].builder(spark, SF).count()
    sc.setJobGroup(None, None)
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    stages = set()
    for j in jobs:
        ji = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/jobs/{j}"))
        stages.update(ji["stageIds"])
    w = r = rows = 0
    for s in stages:
        try:
            si = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages/{s}"))
        except Exception:
            continue
        for att in si:
            w += att.get("shuffleWriteBytes", 0)
            r += att.get("shuffleReadBytes", 0)
            rows += att.get("shuffleWriteRecords", 0)
    return {"write_bytes": w, "read_bytes": r, "write_records": rows}

for name in ["d2_dedup_by_key", "d3_minhash_pairs_capped", "st4_session_window",
             "llm_curation_funnel", "u10_tfidf_topterms"]:
    m = shuffle_bytes(name)
    per = (m["write_bytes"] / m["write_records"]) if m["write_records"] else 0
    print(name, m, f"bytes/record={per:.1f}", flush=True)
