package graft.functions

/** The reference's COMPLETE system session-property inventory —
  * `presto-main/.../SystemSessionProperties.java:170-770` (92
  * registrations, 11 hidden), names/defaults/types/descriptions
  * replicated verbatim as a spec surface (like the system.jdbc column
  * sets; extraction: tools/extract_session_props.py). The reference
  * ACCEPTS and lists every one of these, so a migrating user's
  * `SET SESSION spill_enabled = 'true'` (or any optimizer/ops knob in
  * their runbook) must not fail here. Serving machinery
  * (SET/RESET/SHOW SESSION, type validation, the Spark-conf wiring for
  * the names with a real engine analog) lives in
  * functions/PrestoStatements.scala.
  *
  * Defaults render exactly as the reference's SHOW SESSION does —
  * `firstNonNull(getDefaultValue(), "").toString()`
  * (SessionPropertyManager.java:131-142): airlift Duration "%.2f%s",
  * DataSize integral-or-"%.2f%s", enum names, "" for null. Config-
  * derived defaults are the config classes' field initializers
  * (QueryManagerConfig/TaskManagerConfig/MemoryManagerConfig/
  * FeaturesConfig/NodeMemoryConfig); the three machine-dependent ones
  * (core counts, heap fractions — NodeMemoryConfig.java:35-39,
  * TaskManagerConfig.getInitialSplitsPerNode) are computed from this
  * JVM the same way.
  */
private[graft] object SessionProperties {

  final case class PropDef(name: String, default: String, typ: String,
      desc: String, hidden: Boolean = false,
      // a connector session property (SHOW SESSION renders it
      // catalog-qualified, after the system section — the reference
      // lists catalogs\' properties the same way)
      catalog: Option[String] = None)

  // the reference computes these from the JVM at startup and renders
  // them through the same toString path
  private def cores2: String =
    (Runtime.getRuntime.availableProcessors * 2).toString
  private def heapFrac(f: Double): String = {
    // new DataSize(heap * f, BYTE).toString(): integral renders as a
    // plain long, fractional as %.2f, unit string appended
    val v = Runtime.getRuntime.maxMemory.toDouble * f
    if (math.floor(v) == v) s"${v.toLong}B" else f"$v%.2fB"
  }

  // 92 properties (11 hidden)
  val defs: Seq[PropDef] = Seq(
    PropDef("execution_policy", "all-at-once", "varchar",
      "Policy used for scheduling query tasks"),
    PropDef("optimize_hash_generation", "true", "boolean",
      "Compute hash codes for distribution, joins, and aggregations early in query plan"),
    PropDef("distributed_join", "", "boolean",
      "(DEPRECATED) Use a distributed join instead of a broadcast join. If this is set, join_distribution_type is ignored."),
    PropDef("join_distribution_type", "PARTITIONED", "varchar",
      "The join method to use. Options are BROADCAST,PARTITIONED,AUTOMATIC"),
    PropDef("join_max_broadcast_table_size", "", "varchar",
      "Maximum estimated size of a table that can be broadcast for JOIN.", hidden = true),
    PropDef("distributed_index_join", "false", "boolean",
      "Distribute index joins on join keys instead of executing inline"),
    PropDef("hash_partition_count", "100", "integer",
      "Number of partitions for distributed joins and aggregations"),
    PropDef("partitioning_provider_catalog", "system", "varchar",
      "Name of the catalog providing custom partitioning"),
    PropDef("exchange_materialization_strategy", "NONE", "varchar",
      "The exchange materialization strategy to use. Options are NONE,ALL"),
    PropDef("use_stream_exchange_for_mark_distinct", "false", "boolean",
      "Use streaming instead of materialization for mark distinct with materialized exchange enabled"),
    PropDef("grouped_execution_for_aggregation", "false", "boolean",
      "Use grouped execution for aggregation when possible"),
    PropDef("grouped_execution_for_eligible_table_scans", "false", "boolean",
      "Experimental: Use grouped execution for eligible table scans"),
    PropDef("dynamic_schedule_for_grouped_execution", "false", "boolean",
      "Experimental: Use dynamic schedule for grouped execution when possible"),
    PropDef("max_failed_task_percentage", "0.3", "double",
      "Max percentage of failed tasks that are retryable for recoverable dynamic scheduling"),
    PropDef("recoverable_grouped_execution", "false", "boolean",
      "Experimental: Use recoverable grouped execution when possible"),
    PropDef("max_stage_retries", "0", "integer",
      "Maximum number of times that stages can be retried"),
    PropDef("prefer_streaming_operators", "false", "boolean",
      "Prefer source table layouts that produce streaming operators"),
    PropDef("task_writer_count", "1", "bigint",
      "Default number of local parallel table writer jobs per worker"),
    PropDef("task_partitioned_writer_count", "", "bigint",
      "Number of writers per task for partitioned writes. If not set, the number set by task.writer-count will be used"),
    PropDef("redistribute_writes", "true", "boolean",
      "Force parallel distributed writes"),
    PropDef("scale_writers", "false", "boolean",
      "Scale out writers based on throughput (use minimum necessary)"),
    PropDef("writer_min_size", "32MB", "varchar",
      "Target minimum size of writer output when scaling writers"),
    PropDef("optimized_scale_writer_producer_buffer", "false", "boolean",
      "Optimize scale writer creation based on producer buffer", hidden = true),
    PropDef("push_table_write_through_union", "true", "boolean",
      "Parallelize writes when using UNION ALL in queries that write data"),
    PropDef("task_concurrency", "16", "bigint",
      "Default number of local parallel jobs per worker"),
    PropDef("task_share_index_loading", "false", "boolean",
      "Share index join lookups and caching within a task"),
    PropDef("query_max_run_time", "100.00d", "varchar",
      "Maximum run time of a query (includes the queueing time)"),
    PropDef("query_max_execution_time", "100.00d", "varchar",
      "Maximum execution time of a query"),
    PropDef("query_max_cpu_time", "1000000000.00d", "varchar",
      "Maximum CPU time of a query"),
    PropDef("query_max_memory", "20GB", "varchar",
      "Maximum amount of distributed memory a query can use", hidden = true),
    PropDef("query_max_memory_per_node", heapFrac(0.1), "varchar",
      "Maximum amount of user task memory a query can use", hidden = true),
    PropDef("query_max_total_memory", "40GB", "varchar",
      "Maximum amount of distributed total memory a query can use", hidden = true),
    PropDef("query_max_total_memory_per_node", heapFrac(0.3), "varchar",
      "Maximum amount of total (user + system) task memory a query can use", hidden = true),
    PropDef("resource_overcommit", "false", "boolean",
      "Use resources which are not guaranteed to be available to the query"),
    PropDef("query_max_stage_count", "100", "integer",
      "Temporary: Maximum number of stages a query can have", hidden = true),
    PropDef("dictionary_aggregation", "false", "boolean",
      "Enable optimization for aggregations on dictionaries"),
    PropDef("initial_splits_per_node", cores2, "integer",
      "The number of splits each node will run per task, initially"),
    PropDef("split_concurrency_adjustment_interval", "100.00ms", "varchar",
      "Experimental: Interval between changes to the number of concurrent splits per node"),
    PropDef("optimize_metadata_queries", "false", "boolean",
      "Enable optimization for metadata queries"),
    PropDef("query_priority", "1", "integer",
      "The priority of queries. Larger numbers are higher priority"),
    PropDef("plan_with_table_node_partitioning", "true", "boolean",
      "Experimental: Adapt plan to pre-partitioned tables"),
    PropDef("reorder_joins", "", "boolean",
      "(DEPRECATED) Reorder joins to remove unnecessary cross joins. If this is set, join_reordering_strategy will be ignored"),
    PropDef("join_reordering_strategy", "ELIMINATE_CROSS_JOINS", "varchar",
      "The join reordering strategy to use. Options are NONE,ELIMINATE_CROSS_JOINS,AUTOMATIC"),
    PropDef("partial_merge_pushdown_strategy", "NONE", "varchar",
      "Experimental: Partial merge pushdown strategy to use. Optionas are NONE,PUSH_THROUGH_LOW_MEMORY_OPERATORS"),
    PropDef("max_reordered_joins", "9", "bigint",
      "The maximum number of joins to reorder as one group in cost-based join reordering"),
    PropDef("fast_inequality_joins", "true", "boolean",
      "Use faster handling of inequality join if it is possible"),
    PropDef("colocated_join", "true", "boolean",
      "Experimental: Use a colocated join when possible"),
    PropDef("spatial_join", "true", "boolean",
      "Use spatial index for spatial join when possible"),
    PropDef("spatial_partitioning_table_name", "", "varchar",
      "Name of the table containing spatial partitioning scheme"),
    PropDef("concurrent_lifespans_per_task", "0", "integer",
      "Experimental: Run a fixed number of groups concurrently for eligible JOINs"),
    PropDef("spill_enabled", "false", "boolean",
      "Experimental: Enable spilling"),
    PropDef("aggregation_operator_unspill_memory_limit", "4MB", "varchar",
      "Experimental: How much memory can should be allocated per aggragation operator in unspilling process"),
    PropDef("optimize_mixed_distinct_aggregations", "false", "boolean",
      "Optimize mixed non-distinct and distinct aggregations"),
    PropDef("legacy_row_field_ordinal_access", "false", "boolean",
      "Allow accessing anonymous row field with .field0, .field1, ..."),
    PropDef("do_not_use_legacy_map_subscript", "false", "boolean",
      "Do not fail the query if map key is missing", hidden = true),
    PropDef("iterative_optimizer_enabled", "true", "boolean",
      "Experimental: enable iterative optimizer"),
    PropDef("iterative_optimizer_timeout", "3.00m", "varchar",
      "Timeout for plan optimization in iterative optimizer"),
    PropDef("exchange_compression", "false", "boolean",
      "Enable compression in exchanges"),
    PropDef("legacy_timestamp", "true", "boolean",
      "Use legacy TIME & TIMESTAMP semantics (warning: this will be removed)", hidden = true),
    PropDef("enable_intermediate_aggregations", "false", "boolean",
      "Enable the use of intermediate aggregations"),
    PropDef("push_aggregation_through_join", "true", "boolean",
      "Allow pushing aggregations below joins"),
    PropDef("push_partial_aggregation_through_join", "false", "boolean",
      "Push partial aggregations below joins"),
    PropDef("parse_decimal_literals_as_double", "false", "boolean",
      "Parse decimal literals as DOUBLE instead of DECIMAL"),
    PropDef("force_single_node_output", "true", "boolean",
      "Force single node output", hidden = true),
    PropDef("filter_and_project_min_output_page_size", "500kB", "varchar",
      "Experimental: Minimum output page size for filter and project operators"),
    PropDef("filter_and_project_min_output_page_row_count", "256", "integer",
      "Experimental: Minimum output page row count for filter and project operators"),
    PropDef("distributed_sort", "true", "boolean",
      "Parallelize sort across multiple nodes"),
    PropDef("use_mark_distinct", "true", "boolean",
      "Implement DISTINCT aggregations using MarkDistinct"),
    PropDef("prefer_partial_aggregation", "true", "boolean",
      "Prefer splitting aggregations into partial and final stages"),
    PropDef("optimize_top_n_row_number", "true", "boolean",
      "Use top N row number optimization"),
    PropDef("max_grouping_sets", "2048", "integer",
      "Maximum number of grouping sets in a GROUP BY", hidden = true),
    PropDef("legacy_unnest", "false", "boolean",
      "Using legacy unnest semantic, where unnest(array(row)) will create one column of type row"),
    PropDef("statistics_cpu_timer_enabled", "true", "boolean",
      "Experimental: Enable cpu time tracking for automatic column statistics collection on write"),
    PropDef("enable_stats_calculator", "true", "boolean",
      "Experimental: Enable statistics calculator"),
    PropDef("max_tasks_per_stage", "2147483647", "integer",
      "Maximum number of tasks for a non source distributed stage"),
    PropDef("max_drivers_per_task", "", "integer",
      "Maximum number of drivers per task"),
    PropDef("ignore_stats_calculator_failures", "true", "boolean",
      "Ignore statistics calculator failures"),
    PropDef("print_stats_for_non_join_query", "false", "boolean",
      "Print stats and cost for non-join-query in plan"),
    PropDef("default_filter_factor_enabled", "false", "boolean",
      "use a default filter factor for unknown filters in a filter node"),
    PropDef("push_limit_through_outer_join", "true", "boolean",
      "push limits to the outer side of an outer join"),
    PropDef("max_concurrent_materializations", "3", "integer",
      "Maximum number of materializing plan sections that can run concurrently"),
    PropDef("pushdown_subfields_enabled", "false", "boolean",
      "Experimental: enable subfield pruning"),
    PropDef("table_writer_merge_operator_enabled", "true", "boolean",
      "Experimental: enable table writer merge operator"),
    PropDef("optimize_full_outer_join_with_coalesce", "true", "boolean",
      "optimize partition properties for queries using COALESCE + FULL OUTER JOIN"),
    PropDef("index_loader_timeout", "20.00s", "varchar",
      "Timeout for loading indexes for index joins"),
    PropDef("optimized_repartitioning", "false", "boolean",
      "Experimental: Use optimized repartitioning"),
    PropDef("aggregation_partitioning_merging_strategy", "LEGACY", "varchar",
      "Strategy to merge partition preference in aggregation node. Options are LEGACY,TOP_DOWN,BOTTOM_UP"),
    PropDef("list_built_in_functions_only", "true", "boolean",
      "Only List built-in functions in SHOW FUNCTIONS"),
    PropDef("partitioning_precision_strategy", "AUTOMATIC", "varchar",
      "The strategy to use to pick when to repartition. Options are AUTOMATIC,PREFER_EXACT_PARTITIONING"),
    PropDef("experimental_functions_enabled", "false", "boolean",
      "Enable listing of functions marked as experimental"),
    PropDef("use_legacy_scheduler", "true", "boolean",
      "Use version of scheduler before refactorings for section retries"),
    PropDef("optimize_common_sub_expressions", "true", "boolean",
      "Extract and compute common sub-expressions in projection"),
    // ——— connector session properties ————————————————————————————————
    // presto-hive HiveSessionProperties.java:48,106-117; consumed by
    // the write path (HiveLayout.insertExisting via sessionPropValue)
    PropDef("insert_existing_partitions_behavior", "APPEND", "varchar",
      "Behavior on insert existing partitions; this session property doesn't control behavior on insert existing unpartitioned table",
      catalog = Some("hive")))
}
