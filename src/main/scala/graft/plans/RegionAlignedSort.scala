package graft.plans

import graft.operators.RegionSort
import org.apache.spark.rdd.{RDD, ShuffledRDD}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.Partitioner

/** Exact-region-boundary exchange + KeyValue sort as a first-class
  * Catalyst operator — the one whole-operator semantic Spark's built-ins
  * genuinely cannot express (SURVEY.md §4.1): `repartitionByRange` SAMPLES
  * its boundaries, while HFile bulk load requires output partition i to
  * hold exactly region i's key range (`TotalOrderPartitioner` over
  * `RegionLocator.getStartKeys` in the reference,
  * BulkImporterFromText.java:105-108). A sampled boundary that straddles a
  * region makes HBase split files server-side during adoption.
  *
  * Full extension stack: logical node → planner [[RegionSortStrategy]] →
  * [[RegionAlignedSortExec]] physical operator (one shuffle whose reduce
  * side sorts by the composite (row, family, qualifier) key via Spark's
  * spill-safe shuffle sorter), injectable via `GraftExtensions` or
  * `spark.experimental.extraStrategies`. The RDD-level path
  * (`RegionSort.partitionByRegions`) remains for RDD consumers; this node
  * keeps the result INSIDE the DataFrame/Catalyst world so downstream
  * plans (the sink, stats, AQE) compose.
  */
case class RegionAlignedSort(child: LogicalPlan, splits: Seq[Array[Byte]])
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  /** The exec reads (row, family, qualifier) positionally — declare every
    * child column referenced so ColumnPruning can't insert a Project
    * below this node (it would, for e.g. a downstream count()). */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(child.output)
  override protected def withNewChildInternal(newChild: LogicalPlan): RegionAlignedSort =
    copy(child = newChild)
}

case class RegionAlignedSortExec(child: SparkPlan, splits: Seq[Array[Byte]])
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def outputOrdering: Seq[SortOrder] =
    child.output.take(1).map(a => SortOrder(a, Ascending))

  private type K = (Array[Byte], Array[Byte], Array[Byte])

  override protected def doExecute(): RDD[InternalRow] = {
    val regionPart = new RegionSort.RegionPartitioner(splits.toArray)
    val part = new Partitioner {
      override def numPartitions: Int = regionPart.numPartitions
      override def getPartition(key: Any): Int =
        regionPart.getPartition(key.asInstanceOf[K]._1)
    }
    implicit val ord: Ordering[K] = Ordering.Tuple3(
      RegionSort.unsignedBytesOrdering,
      RegionSort.unsignedBytesOrdering,
      RegionSort.unsignedBytesOrdering)
    // cell schema contract: columns 0..2 are (row, family, qualifier) binary
    val keyed = child.execute().mapPartitions { it =>
      it.map { row =>
        ((row.getBinary(0), row.getBinary(1), row.getBinary(2)),
          row.copy())
      }
    }
    new ShuffledRDD[K, InternalRow, InternalRow](keyed, part)
      .setKeyOrdering(ord) // reduce-side spill-safe sort (ExternalSorter)
      .mapPartitions(_.map(_._2), preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): RegionAlignedSortExec =
    copy(child = newChild)
}

object RegionSortStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RegionAlignedSort(child, splits) =>
      RegionAlignedSortExec(planLater(child), splits) :: Nil
    case _ => Nil
  }
}

object RegionAlignedSort {
  /** DataFrame-level API: cells (row/family/qualifier binary leading
    * columns) → exact region-aligned, KV-sorted DataFrame. */
  def apply(cells: DataFrame, splits: Array[Array[Byte]]): DataFrame = {
    val spark: SparkSession = cells.sparkSession
    if (!spark.experimental.extraStrategies.contains(RegionSortStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RegionSortStrategy
    }
    Bridge.ofRows(spark, new RegionAlignedSort(Bridge.logicalPlan(cells), splits.toSeq))
  }
}
