import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from fortissimo_spark.io_tables import build_pages, write_bucketed_pages

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.warehouse.dir", "/root/repo/.bench_scratch/warehouse")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
pages = build_pages(spark, "/root/testdata/sf0.1", amplify=40, num_partitions=128)
write_bucketed_pages(pages, "pages_bucketed",
                     location="/root/repo/.bench_scratch/warehouse/pages_bucketed")
print("bucketed table written")
spark.stop()
