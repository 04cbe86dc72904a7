package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The geometry QUERY shape carried into the [[GeoWalk]] kernels —
  * driver-validated constants, flat double arrays so the per-row walk
  * is a cache-friendly JVM loop. Rings are stored OPEN (first != last,
  * the closing edge implicit), flat `[lat0, lon0, lat1, lon1, ...]`.
  * Serializable: the object rides the expression tree (and whole-stage
  * codegen's `references` array) to executors.
  */
sealed trait GeoQueryShape extends Serializable

/** An envelope (or a point, as the degenerate zero-area box). */
final case class GeoBoxShape(latB: Double, latT: Double,
    lonL: Double, lonR: Double) extends GeoQueryShape {
  def zeroArea: Boolean = latB == latT && lonL == lonR
}

/** A polygon: ring 0 the shell, rings 1+ holes (even-odd region).
  * equals/hashCode are content-based (Arrays.deepEquals) — the default
  * reference equality of array fields would defeat Catalyst expression
  * canonicalization and common-subexpression dedup when the same shape
  * appears in the query clause and its DLQ twin.
  */
final case class GeoRegionShape(rings: Array[Array[Double]]) extends GeoQueryShape {
  override def equals(o: Any): Boolean = o match {
    case GeoRegionShape(r) =>
      java.util.Arrays.deepEquals(rings.asInstanceOf[Array[AnyRef]],
        r.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    java.util.Arrays.deepHashCode(rings.asInstanceOf[Array[AnyRef]])
}

/** A multipolygon: components of rings (shell + holes each).
  * Content-based equals/hashCode — see [[GeoRegionShape]].
  */
final case class GeoPolysShape(polys: Array[Array[Array[Double]]]) extends GeoQueryShape {
  override def equals(o: Any): Boolean = o match {
    case GeoPolysShape(p) =>
      java.util.Arrays.deepEquals(polys.asInstanceOf[Array[AnyRef]],
        p.asInstanceOf[Array[AnyRef]])
    case _ => false
  }
  override def hashCode: Int =
    java.util.Arrays.deepHashCode(polys.asInstanceOf[Array[AnyRef]])
}

/** A circle: center + radius in the engine's pinned 6-dp haversine km. */
final case class GeoCircleShape(lat: Double, lon: Double,
    radiusKm: Double) extends GeoQueryShape

/** Doc-side `geo_shape` relation as ONE static-call `doGenCode`
  * expression (the `Ipv6Parse` doctrine, VERDICT r13 #1): the parity /
  * crossing / distance walks run as plain JVM loops over the row's
  * geometry column instead of unrolled expression terms or interpreted
  * higher-order-function trees. This is what lifts the 64-vertex cap
  * to [[GeoWalk.DefaultCap]] (16384): vertices are DATA to a loop, not
  * codegen terms, so Janino's 64KB method wall no longer binds — and
  * the loop is faster than the interpreted HOF lambdas it replaces.
  *
  * Returns a TINYINT classification so the predicate and the DLQ
  * side-output share ONE walk and can never drift (the geoShapeDlq
  * doctrine): NULL = dirty row (tri-state drop: NULL geometry, too few
  * vertices, NULL coordinate), 0 = relation false, 1 = relation true,
  * 2 = poison past the vertex cap, 3 = poison self-intersecting ring.
  * Classification order is pinned: dirty, then the cap (BEFORE the
  * O(n²)-worst-case simplicity walk — a hostile row must not buy
  * unbounded CPU), then simplicity, then the relation.
  *
  * `docKind`: polygon (one open ring, `array<struct<lat,lon>>`), rings
  * (shell + holes), polys (multipolygon), linestring (open chain —
  * may legitimately self-cross, no simplicity check), multilinestring,
  * multipoint. Reference anchor: the SEARCH collection's geo contract,
  * `lib/opensearch-dynamodb-etl-cdk-stack.ts:91`.
  */
case class GeoDocRelate(child: Expression, docKind: String,
    shape: GeoQueryShape, relation: String, cap: Int)
    extends UnaryExpression {

  override def dataType: DataType = ByteType
  override def nullable: Boolean = true
  override def prettyName: String = "geo_doc_relate"

  private val docKindCode: Int = GeoWalk.docKindCode(docKind)
  private val relCode: Int = GeoWalk.relationCode(relation)

  /** The leaf vertex struct's lat/lon slot indices — and, for the
    * geometrycollection, the element struct's kind/pts slots —
    * resolved by NAME from the column's schema (the engine's
    * explicit-field geo convention — no positional guessing).
    */
  private lazy val (latIdx: Int, lonIdx: Int) = {
    val leaf = GeoWalk.leafStruct(child.dataType, docKindCode)
    (leaf.fieldIndex("lat"), leaf.fieldIndex("lon"))
  }

  private lazy val (kindIdx: Int, ptsIdx: Int) = {
    val elt = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    (elt.fieldIndex("kind"), elt.fieldIndex("pts"))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    GeoWalk.checkGeomType(child.dataType, docKindCode, prettyName, docKind)

  override protected def nullSafeEval(geom: Any): Any =
    if (docKindCode == GeoWalk.KindCollection)
      GeoWalk.relateCollection(geom.asInstanceOf[ArrayData], kindIdx, ptsIdx,
        latIdx, lonIdx, shape, relCode, cap)
    else
      GeoWalk.relate(geom.asInstanceOf[ArrayData], docKindCode, latIdx, lonIdx,
        shape, relCode, cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shapeRef = ctx.addReferenceObj("geoQueryShape", shape,
      classOf[GeoQueryShape].getName)
    nullSafeCodeGen(ctx, ev, g => {
      val r = ctx.freshName("geoRel")
      val call =
        if (docKindCode == GeoWalk.KindCollection)
          s"""graft.plans.GeoWalk.relateCollection($g, $kindIdx, $ptsIdx,
             |  $latIdx, $lonIdx, (graft.plans.GeoQueryShape) $shapeRef,
             |  $relCode, $cap)""".stripMargin
        else
          s"""graft.plans.GeoWalk.relate($g, $docKindCode,
             |  $latIdx, $lonIdx, (graft.plans.GeoQueryShape) $shapeRef,
             |  $relCode, $cap)""".stripMargin
      s"""java.lang.Byte $r = $call;
         |${ev.isNull} = ($r == null);
         |${ev.value} = ($r == null) ? (byte) 0 : $r.byteValue();""".stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): GeoDocRelate =
    copy(child = newChild)
}

object GeoDocRelate {
  def apply(c: Column, docKind: String, shape: GeoQueryShape,
      relation: String, cap: Int = GeoWalk.DefaultCap): Column =
    ColumnBridge.column(GeoDocRelate(ColumnBridge.expression(c), docKind,
      shape, relation, cap))
}

/** Point-doc membership in a query polygon/multipolygon past the
  * 64-term codegen comfort zone: the crossing-parity (or, for a single
  * strictly-convex CCW ring, the boundary-inclusive half-plane) walk
  * as one JVM loop over the shape's vertex arrays. Semantics replicate
  * the unrolled Column walks exactly — same cross-product formulas,
  * same IEEE operand order, and the same NULL collapse (a NULL
  * coordinate contributes no crossing, so membership is FALSE, never
  * NULL — the `when(...).otherwise(0)` parity convention).
  */
case class GeoPointInShape(latE: Expression, lonE: Expression,
    shape: GeoQueryShape) extends BinaryExpression {

  override def left: Expression = latE
  override def right: Expression = lonE
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "geo_point_in_shape"

  override def checkInputDataTypes(): TypeCheckResult =
    if (latE.dataType == DoubleType && lonE.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE lat/lon, got " +
        s"${latE.dataType.simpleString}/${lonE.dataType.simpleString}")

  override def eval(input: InternalRow): Any = {
    val la = latE.eval(input)
    val lo = lonE.eval(input)
    if (la == null || lo == null) false
    else GeoWalk.pointInShape(la.asInstanceOf[Double], lo.asInstanceOf[Double],
      shape)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.{FalseLiteral, JavaCode}
    val shapeRef = ctx.addReferenceObj("geoQueryShape", shape,
      classOf[GeoQueryShape].getName)
    val laC = latE.genCode(ctx)
    val loC = lonE.genCode(ctx)
    val value = ctx.freshName("geoIn")
    ev.copy(
      code = code"""
        ${laC.code}
        ${loC.code}
        boolean $value = false;
        if (!${laC.isNull} && !${loC.isNull}) {
          $value = graft.plans.GeoWalk.pointInShape(${laC.value},
            ${loC.value}, (graft.plans.GeoQueryShape) $shapeRef);
        }""",
      value = JavaCode.variable(value, BooleanType),
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): GeoPointInShape =
    copy(latE = newLeft, lonE = newRight)
}

object GeoPointInShape {
  def apply(lat: Column, lon: Column, shape: GeoQueryShape): Column =
    ColumnBridge.column(GeoPointInShape(ColumnBridge.expression(lat),
      ColumnBridge.expression(lon), shape))
}

/** Poison classification alone — the DLQ side-outputs' expression
  * ([[GeoWalk.classify]]: 0 clean-or-dirty, 2 past the vertex cap, 3
  * self-intersecting). Shares the exact parse + cap + simplicity
  * kernels the [[GeoDocRelate]] predicate runs, so the query and its
  * dead-letter view can never drift — now enforced by construction
  * (one JVM method), not just by a shared SQL builder.
  */
case class GeoDocClassify(child: Expression, docKind: String, cap: Int)
    extends UnaryExpression {

  override def dataType: DataType = ByteType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "geo_doc_classify"

  private val docKindCode: Int = GeoWalk.docKindCode(docKind)

  private lazy val (latIdx: Int, lonIdx: Int) = {
    val leaf = GeoWalk.leafStruct(child.dataType, docKindCode)
    (leaf.fieldIndex("lat"), leaf.fieldIndex("lon"))
  }

  private lazy val (kindIdx: Int, ptsIdx: Int) = {
    val elt = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    (elt.fieldIndex("kind"), elt.fieldIndex("pts"))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    GeoWalk.checkGeomType(child.dataType, docKindCode, prettyName, docKind)

  override protected def nullSafeEval(geom: Any): Any =
    if (docKindCode == GeoWalk.KindCollection)
      GeoWalk.classifyCollection(geom.asInstanceOf[ArrayData], kindIdx, ptsIdx,
        latIdx, lonIdx, cap)
    else
      GeoWalk.classify(geom.asInstanceOf[ArrayData], docKindCode, latIdx,
        lonIdx, cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g =>
      if (docKindCode == GeoWalk.KindCollection)
        s"""${ev.value} = graft.plans.GeoWalk.classifyCollection($g, $kindIdx,
           |  $ptsIdx, $latIdx, $lonIdx, $cap);""".stripMargin
      else
        s"""${ev.value} = graft.plans.GeoWalk.classify($g, $docKindCode,
           |  $latIdx, $lonIdx, $cap);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GeoDocClassify =
    copy(child = newChild)
}

object GeoDocClassify {
  def apply(c: Column, docKind: String, cap: Int = GeoWalk.DefaultCap): Column =
    ColumnBridge.column(GeoDocClassify(ColumnBridge.expression(c), docKind, cap))
}

/** The envelope-sidecar walk (r15, VERDICT r14 #1): derive
  * `(lat_min, lat_max, lon_min, lon_max, _geo_valid)` from a geometry
  * column ONCE at materialize time — [[GeoWalk.bboxRow]] /
  * [[GeoWalk.bboxRowCollection]] share [[GeoDocRelate]]'s exact parse,
  * cap and simplicity kernels, so the sidecar's validity can never
  * drift from what the query-time kernel would classify. The four
  * corner columns are plain nullable DOUBLEs: flattened to top-level
  * parquet columns (see `graft.etl.GeoEnvelope`) they carry row-group
  * statistics and take PushedFilters, which is the entire point — a
  * selective geo_shape query prunes at the reader instead of
  * kernel-walking the corpus.
  */
case class GeoDocBbox(child: Expression, docKind: String, cap: Int)
    extends UnaryExpression {

  override def dataType: DataType = GeoDocBbox.schema
  override def nullable: Boolean = true
  override def prettyName: String = "geo_doc_bbox"

  private val docKindCode: Int = GeoWalk.docKindCode(docKind)

  private lazy val (latIdx: Int, lonIdx: Int) = {
    val leaf = GeoWalk.leafStruct(child.dataType, docKindCode)
    (leaf.fieldIndex("lat"), leaf.fieldIndex("lon"))
  }

  private lazy val (kindIdx: Int, ptsIdx: Int) = {
    val elt = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    (elt.fieldIndex("kind"), elt.fieldIndex("pts"))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    GeoWalk.checkGeomType(child.dataType, docKindCode, prettyName, docKind)

  override protected def nullSafeEval(geom: Any): Any =
    if (docKindCode == GeoWalk.KindCollection)
      GeoWalk.bboxRowCollection(geom.asInstanceOf[ArrayData], kindIdx, ptsIdx,
        latIdx, lonIdx, cap)
    else
      GeoWalk.bboxRow(geom.asInstanceOf[ArrayData], docKindCode, latIdx,
        lonIdx, cap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val r = ctx.freshName("geoBbox")
      val call =
        if (docKindCode == GeoWalk.KindCollection)
          s"""graft.plans.GeoWalk.bboxRowCollection($g, $kindIdx, $ptsIdx,
             |  $latIdx, $lonIdx, $cap)""".stripMargin
        else
          s"""graft.plans.GeoWalk.bboxRow($g, $docKindCode,
             |  $latIdx, $lonIdx, $cap)""".stripMargin
      s"""org.apache.spark.sql.catalyst.InternalRow $r = $call;
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GeoDocBbox =
    copy(child = newChild)
}

object GeoDocBbox {
  val schema: StructType = StructType(Seq(
    StructField("lat_min", DoubleType, nullable = true),
    StructField("lat_max", DoubleType, nullable = true),
    StructField("lon_min", DoubleType, nullable = true),
    StructField("lon_max", DoubleType, nullable = true),
    StructField("_geo_valid", BooleanType, nullable = true)))

  def apply(c: Column, docKind: String, cap: Int = GeoWalk.DefaultCap): Column =
    ColumnBridge.column(GeoDocBbox(ColumnBridge.expression(c), docKind, cap))
}

/** Grid-cell coverage of a doc SHAPE (r15, VERDICT r14 #4): the cell
  * ids — geohash base-32 strings or `z/x/y` web-mercator tile keys —
  * of every grid cell the row's geometry intersects, as one kernel
  * walk: parse once, enumerate the candidate cells of the shape's own
  * bbox through EXACTLY the quantizer arithmetic the point-doc
  * `geohashCol`/`geotileCol` columns run (same IEEE op order, so a
  * degenerate one-point shape lands in the same cell as the point
  * agg), then keep the candidates whose rect intersects the geometry
  * (the same box-relation walks the geo_shape predicate runs).
  * `explode` + groupBy downstream — the same shuffle shape as the
  * point-doc grid aggs, with per-(row, cell) fan-out bounded by the
  * fail-loud `cellCap` (the engine's 100k enumeration doctrine: a
  * continent-sized shape at precision 12 must refuse, not OOM).
  *
  * NULL for dirty rows (the tri-state drop); POISON (past the vertex
  * cap — checked FIRST — or a self-intersecting polygon-family ring)
  * THROWS with the pinned messages: the agg surface has no DLQ arm,
  * and silently bucketing a misjudged interior would fabricate counts.
  */
case class GeoGridCells(child: Expression, docKind: String, gridKind: String,
    precision: Int, cap: Int, cellCap: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "geo_grid_cells"

  private val docKindCode: Int = GeoWalk.docKindCode(docKind)
  private val gridCode: Int = gridKind match {
    case "geohash" => 0
    case "geotile" => 1
    case other => throw new IllegalArgumentException(s"grid kind '$other'")
  }

  private lazy val (latIdx: Int, lonIdx: Int) = {
    val leaf = GeoWalk.leafStruct(child.dataType, docKindCode)
    (leaf.fieldIndex("lat"), leaf.fieldIndex("lon"))
  }

  private lazy val (kindIdx: Int, ptsIdx: Int) = {
    val elt = child.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    (elt.fieldIndex("kind"), elt.fieldIndex("pts"))
  }

  override def checkInputDataTypes(): TypeCheckResult =
    GeoWalk.checkGeomType(child.dataType, docKindCode, prettyName, docKind)

  override protected def nullSafeEval(geom: Any): Any =
    if (docKindCode == GeoWalk.KindCollection)
      GeoWalk.gridCellsCollection(geom.asInstanceOf[ArrayData], kindIdx, ptsIdx,
        latIdx, lonIdx, gridCode, precision, cap, cellCap)
    else
      GeoWalk.gridCells(geom.asInstanceOf[ArrayData], docKindCode, latIdx,
        lonIdx, gridCode, precision, cap, cellCap)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, g => {
      val r = ctx.freshName("gridCells")
      val call =
        if (docKindCode == GeoWalk.KindCollection)
          s"""graft.plans.GeoWalk.gridCellsCollection($g, $kindIdx, $ptsIdx,
             |  $latIdx, $lonIdx, $gridCode, $precision, $cap, $cellCap)""".stripMargin
        else
          s"""graft.plans.GeoWalk.gridCells($g, $docKindCode,
             |  $latIdx, $lonIdx, $gridCode, $precision, $cap, $cellCap)""".stripMargin
      s"""org.apache.spark.sql.catalyst.util.ArrayData $r = $call;
         |${ev.isNull} = ($r == null);
         |${ev.value} = $r;""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): GeoGridCells =
    copy(child = newChild)
}

object GeoGridCells {
  def apply(c: Column, docKind: String, gridKind: String, precision: Int,
      cap: Int = GeoWalk.DefaultCap, cellCap: Int = 100000): Column =
    ColumnBridge.column(GeoGridCells(ColumnBridge.expression(c), docKind,
      gridKind, precision, cap, cellCap))
}

/** The JVM geometry kernels behind [[GeoDocRelate]] / [[GeoPointInShape]].
  * Every formula is the SAME IEEE expression (operands in the same
  * order) the former Column / HOF walks computed, so results are
  * bit-identical and every pre-existing geo oracle re-verifies
  * unchanged: crossing parity `(bLon-aLon)*(py-aLat)-(bLat-aLat)*(px-aLon)`,
  * box-edge separating axes, the segment-intersection orientation
  * tests, and the q125 pinned haversine (for circle query shapes).
  */
object GeoWalk {

  /** The lifted vertex cap (VERDICT r13 #1): vertices are loop data
    * now, not codegen terms, so the binding constraint is the
    * simplicity walk's worst case, not Janino. 16384 total vertices
    * keeps even a hostile fully-overlapping ring's O(n²) pair walk
    * bounded (~134M cheap bbox probes), while honest zone polygons
    * (hundreds to low thousands of vertices, spatially local edges)
    * sweep in near-linear time. Fail-loud beyond, like the old 64.
    */
  val DefaultCap: Int = 16384

  // docKind codes
  final val KindPolygon = 0
  final val KindRings = 1
  final val KindPolys = 2
  final val KindLinestring = 3
  final val KindMultiLinestring = 4
  final val KindMultiPoint = 5
  final val KindCollection = 6

  // relation codes
  final val RelIntersects = 0
  final val RelWithin = 1
  final val RelContains = 2
  final val RelDisjoint = 3

  // classification codes (java.lang.Byte; null = dirty drop)
  private val True = java.lang.Byte.valueOf(1: Byte)
  private val False = java.lang.Byte.valueOf(0: Byte)
  private val TooMany = java.lang.Byte.valueOf(2: Byte)
  private val SelfX = java.lang.Byte.valueOf(3: Byte)
  private val BadKind = java.lang.Byte.valueOf(4: Byte)

  def docKindCode(k: String): Int = k match {
    case "polygon"            => KindPolygon
    case "rings"              => KindRings
    case "polys"              => KindPolys
    case "linestring"         => KindLinestring
    case "multilinestring"    => KindMultiLinestring
    case "multipoint"         => KindMultiPoint
    case "geometrycollection" => KindCollection
    case other => throw new IllegalArgumentException(s"geo docKind '$other'")
  }

  def relationCode(r: String): Int = r match {
    case "intersects" => RelIntersects
    case "within"     => RelWithin
    case "contains"   => RelContains
    case "disjoint"   => RelDisjoint
    case other => throw new IllegalArgumentException(s"geo relation '$other'")
  }

  /** Array nesting depth above the vertex struct for a docKind (the
    * geometrycollection carries its own typed element struct and is
    * validated separately).
    */
  def kindDepth(kind: Int): Int = kind match {
    case KindPolygon | KindLinestring | KindMultiPoint => 1
    case KindRings | KindMultiLinestring               => 2
    case KindPolys                                     => 3
    case KindCollection                                => 3
  }

  def leafStruct(dt: DataType, kind: Int): StructType =
    if (kind == KindCollection) {
      val elt = dt.asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
      elt("pts").dataType.asInstanceOf[ArrayType]
        .elementType.asInstanceOf[ArrayType]
        .elementType.asInstanceOf[StructType]
    } else {
      var d: DataType = dt
      var n = kindDepth(kind)
      while (n > 0) {
        d = d.asInstanceOf[ArrayType].elementType
        n -= 1
      }
      d.asInstanceOf[StructType]
    }

  /** The one schema validator both expressions share. */
  def checkGeomType(dt: DataType, kindCode: Int, where: String,
      docKind: String): TypeCheckResult = {
    def latLonOk(st: StructType): Boolean =
      st.fieldNames.contains("lat") && st.fieldNames.contains("lon") &&
        st("lat").dataType == DoubleType && st("lon").dataType == DoubleType
    if (kindCode == KindCollection) {
      val ok = dt match {
        case ArrayType(elt: StructType, _)
            if elt.fieldNames.contains("kind") && elt.fieldNames.contains("pts") &&
              elt("kind").dataType == StringType =>
          elt("pts").dataType match {
            case ArrayType(ArrayType(leaf: StructType, _), _) => latLonOk(leaf)
            case _ => false
          }
        case _ => false
      }
      if (ok) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$where(geometrycollection) requires array<struct<kind: string, " +
          s"pts: array<array<struct<lat: double, lon: double>>>>>, got " +
          dt.simpleString)
    } else {
      val depth = kindDepth(kindCode)
      def unwrap(d: DataType, n: Int): Option[StructType] = (d, n) match {
        case (ArrayType(inner, _), m) if m > 0 => unwrap(inner, m - 1)
        case (st: StructType, 0)               => Some(st)
        case _                                 => None
      }
      unwrap(dt, depth) match {
        case Some(st) if latLonOk(st) => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$where($docKind) requires ${"array<" * depth}struct<lat: " +
            s"double, lon: double>${">" * depth}, got " + dt.simpleString)
      }
    }
  }

  // ------------------------------------------------------------ parsing

  /** Minimum vertices per leaf chain for a docKind (rings 3, chains 2,
    * points 1) — fewer is DIRTY (no interior/extent to misjudge), the
    * tri-state drop.
    */
  private def minLeaf(kind: Int): Int = kind match {
    case KindLinestring | KindMultiLinestring => 2
    case KindMultiPoint                       => 1
    case _                                    => 3
  }

  /** Parse the geometry column into components → chains → flat
    * [lat, lon]* arrays, or null on ANY dirt (NULL element at any
    * level, too-few vertices, NULL coordinate — the current arms'
    * dirtyDrop predicates, exactly).
    */
  private def parse(geom: ArrayData, kind: Int, latIdx: Int,
      lonIdx: Int): Array[Array[Array[Double]]] = {

    def leafChain(a: ArrayData): Array[Double] = {
      val n = a.numElements()
      if (n < minLeaf(kind)) return null
      val out = new Array[Double](2 * n)
      var i = 0
      while (i < n) {
        if (a.isNullAt(i)) return null
        val v = a.getStruct(i, 2 max (latIdx max lonIdx) + 1)
        if (v.isNullAt(latIdx) || v.isNullAt(lonIdx)) return null
        out(2 * i) = v.getDouble(latIdx)
        out(2 * i + 1) = v.getDouble(lonIdx)
        i += 1
      }
      out
    }

    kind match {
      case KindPolygon | KindLinestring | KindMultiPoint =>
        val c = leafChain(geom)
        if (c == null) null else Array(Array(c))
      case KindRings | KindMultiLinestring =>
        val n = geom.numElements()
        if (n < 1) return null
        val rings = new Array[Array[Double]](n)
        var i = 0
        while (i < n) {
          if (geom.isNullAt(i)) return null
          val r = leafChain(geom.getArray(i))
          if (r == null) return null
          rings(i) = r
          i += 1
        }
        Array(rings)
      case KindPolys =>
        val np = geom.numElements()
        if (np < 1) return null
        val polys = new Array[Array[Array[Double]]](np)
        var p = 0
        while (p < np) {
          if (geom.isNullAt(p)) return null
          val pa = geom.getArray(p)
          val nr = pa.numElements()
          if (nr < 1) return null
          val rings = new Array[Array[Double]](nr)
          var i = 0
          while (i < nr) {
            if (pa.isNullAt(i)) return null
            val r = leafChain(pa.getArray(i))
            if (r == null) return null
            rings(i) = r
            i += 1
          }
          polys(p) = rings
          p += 1
        }
        polys
    }
  }

  // ------------------------------------------------------ classification

  /** The ONE classification + relation walk (predicate and DLQ both
    * call this — they can never drift). Null = dirty; 2/3 = poison;
    * 0/1 = the relation's answer.
    */
  def relate(geom: ArrayData, kind: Int, latIdx: Int, lonIdx: Int,
      shape: GeoQueryShape, rel: Int, cap: Int): java.lang.Byte = {
    val comps = parse(geom, kind, latIdx, lonIdx)
    if (comps == null) return null
    var total = 0
    var p = 0
    while (p < comps.length) {
      var i = 0
      while (i < comps(p).length) {
        total += comps(p)(i).length >> 1
        i += 1
      }
      p += 1
    }
    if (total > cap) return TooMany
    if (kind == KindPolygon || kind == KindRings || kind == KindPolys) {
      p = 0
      while (p < comps.length) {
        var i = 0
        while (i < comps(p).length) {
          val r = comps(p)(i)
          if ((r.length >> 1) > 3 && ringSelfIntersects(r)) return SelfX
          i += 1
        }
        p += 1
      }
    }
    val ans = kind match {
      case KindPolygon | KindRings | KindPolys =>
        ringedRelate(comps, kind == KindPolys, shape, rel)
      case KindLinestring | KindMultiLinestring =>
        lineRelate(comps(0), shape, rel)
      case KindMultiPoint =>
        pointsRelate(comps(0)(0), shape, rel)
    }
    if (ans) True else False
  }

  /** Poison classification alone (the DLQ side-output's walk): 0 =
    * clean or dirty (not poison), 2 = too many vertices, 3 = self-
    * intersecting. Shares [[relate]]'s parse and checks via the same
    * kernels — kept separate so the DLQ never needs a query shape.
    */
  def classify(geom: ArrayData, kind: Int, latIdx: Int, lonIdx: Int,
      cap: Int): Byte = {
    val comps = parse(geom, kind, latIdx, lonIdx)
    if (comps == null) return 0
    var total = 0
    var p = 0
    while (p < comps.length) {
      var i = 0
      while (i < comps(p).length) {
        total += comps(p)(i).length >> 1
        i += 1
      }
      p += 1
    }
    if (total > cap) return 2
    if (kind == KindPolygon || kind == KindRings || kind == KindPolys) {
      p = 0
      while (p < comps.length) {
        var i = 0
        while (i < comps(p).length) {
          val r = comps(p)(i)
          if ((r.length >> 1) > 3 && ringSelfIntersects(r)) return 3
          i += 1
        }
        p += 1
      }
    }
    0
  }

  // ------------------------------------------------- geometrycollection

  /** GeoJSON GeometryCollection docs (r14): each row carries MIXED
    * typed components — `array<struct<kind: string, pts:
    * array<array<struct<lat, lon>>>>>` where `pts` is rings for a
    * `polygon` component (shell + holes), chains for a `linestring`,
    * and one single-vertex chain for a `point`. Parse + classify +
    * relate in one walk: dirty (NULL element/kind/pts, too-few
    * vertices) → null; an unrecognized kind → code 4 (POISON — silent
    * skipping would fabricate answers); the shared cap counts TOTAL
    * vertices across components; simplicity applies to polygon rings
    * only. Relations compose per the collection contract: intersects =
    * ANY component intersects; within = EVERY component within;
    * disjoint = complement; contains = ANY component contains (only a
    * polygon can hold area; line/point components contain exactly the
    * zero-area queries lying on them — false on area queries, never a
    * fail: the polygon components may still serve them).
    */
  def relateCollection(geom: ArrayData, kindIdx: Int, ptsIdx: Int,
      latIdx: Int, lonIdx: Int, shape: GeoQueryShape, rel: Int,
      cap: Int): java.lang.Byte = {
    val parsed = parseCollection(geom, kindIdx, ptsIdx, latIdx, lonIdx)
    if (parsed == null) return null
    val (kinds, comps) = parsed
    if (kinds.isEmpty) return null
    if (kinds(0) == -99) return BadKind // the parse's bad-kind sentinel
    var total = 0
    var i = 0
    while (i < comps.length) {
      var j = 0
      while (j < comps(i).length) {
        total += comps(i)(j).length >> 1
        j += 1
      }
      i += 1
    }
    if (total > cap) return TooMany
    i = 0
    while (i < kinds.length) {
      if (kinds(i) == 0) {
        var j = 0
        while (j < comps(i).length) {
          val r = comps(i)(j)
          if ((r.length >> 1) > 3 && ringSelfIntersects(r)) return SelfX
          j += 1
        }
      }
      i += 1
    }
    // A point component may carry several single-vertex chains (the
    // parse enforces 1 vertex PER CHAIN but not 1 chain per component);
    // flatten them so every vertex participates in the relation —
    // evaluating only chain 0 would silently ignore the rest.
    def flatPoints(chains: Array[Array[Double]]): Array[Double] =
      if (chains.length == 1) chains(0)
      else {
        val out = new Array[Double](2 * chains.length)
        var j = 0
        while (j < chains.length) {
          out(2 * j) = chains(j)(0); out(2 * j + 1) = chains(j)(1); j += 1
        }
        out
      }
    def compRel(k: Int, pts: Array[Array[Double]], r: Int): Boolean = k match {
      case 0 => ringedRelate(Array(pts), perComponent = false, shape, r)
      case 1 => lineRelate(pts, shape, r)
      case _ => pointsRelate(flatPoints(pts), shape, r)
    }
    val ans = rel match {
      case RelIntersects =>
        kinds.indices.exists(i0 => compRel(kinds(i0), comps(i0), RelIntersects))
      case RelDisjoint =>
        !kinds.indices.exists(i0 => compRel(kinds(i0), comps(i0), RelIntersects))
      case RelWithin =>
        kinds.indices.forall(i0 => compRel(kinds(i0), comps(i0), RelWithin))
      case RelContains =>
        kinds.indices.exists { i0 =>
          kinds(i0) match {
            case 0 => compRel(0, comps(i0), RelContains)
            case 1 => shape match {
              // a chain contains exactly the zero-area queries ON it
              case b: GeoBoxShape if b.zeroArea =>
                lineRelate(comps(i0), shape, RelIntersects)
              case _ => false
            }
            case _ => shape match {
              case b: GeoBoxShape if b.zeroArea =>
                pointsRelate(flatPoints(comps(i0)), shape, RelIntersects)
              case _ => false
            }
          }
        }
    }
    if (ans) True else False
  }

  /** Classification-only twin (the collection DLQ): 0 clean/dirty,
    * 2 too many vertices, 3 self-intersecting polygon ring, 4 unknown
    * component kind.
    */
  def classifyCollection(geom: ArrayData, kindIdx: Int, ptsIdx: Int,
      latIdx: Int, lonIdx: Int, cap: Int): Byte = {
    val parsed = parseCollection(geom, kindIdx, ptsIdx, latIdx, lonIdx)
    if (parsed == null) return 0
    val (kinds, comps) = parsed
    if (kinds.isEmpty) return 0
    if (kinds(0) == -99) return 4
    var total = 0
    var i = 0
    while (i < comps.length) {
      var j = 0
      while (j < comps(i).length) { total += comps(i)(j).length >> 1; j += 1 }
      i += 1
    }
    if (total > cap) return 2
    i = 0
    while (i < kinds.length) {
      if (kinds(i) == 0) {
        var j = 0
        while (j < comps(i).length) {
          val r = comps(i)(j)
          if ((r.length >> 1) > 3 && ringSelfIntersects(r)) return 3
          j += 1
        }
      }
      i += 1
    }
    0
  }

  // ------------------------------------------------------ bbox sidecar

  /** Bbox + validity walk for the envelope SIDECAR (r15, VERDICT r14
    * #1): one parse shared with [[relate]]/[[classify]], run ONCE at
    * materialize time so geo_shape queries over geometry docs can
    * pre-filter on four pushable numeric corner columns instead of
    * kernel-walking the whole corpus per request. Returns null for
    * DIRTY rows (no extent to misjudge — the tri-state drop carries
    * into NULL sidecar corners, which every pushable corner
    * conjunction excludes); otherwise
    * `(lat_min, lat_max, lon_min, lon_max, _geo_valid)` where
    * `_geo_valid` is false for POISON geometry (past the vertex cap —
    * checked FIRST, so the simplicity walk is never bought by a
    * hostile row — or a self-intersecting polygon-family ring). The
    * bbox itself is still the honest vertex extent for poison rows:
    * the corners prune, the query-time kernel still classifies
    * survivors, so poison discipline cannot silently vanish.
    */
  def bboxRow(geom: ArrayData, kind: Int, latIdx: Int,
      lonIdx: Int, cap: Int): InternalRow = {
    val comps = parse(geom, kind, latIdx, lonIdx)
    if (comps == null) return null
    bboxOf(comps, ringed = kind == KindPolygon || kind == KindRings ||
      kind == KindPolys, cap)
  }

  /** Geometrycollection twin of [[bboxRow]]: an unknown component kind
    * is poison (`_geo_valid` false) with NULL corners — no trustworthy
    * extent exists, and NULL corners fail every pushable conjunction
    * so such rows reach the query-time kernel's fail-loud path only
    * through the DLQ contract, never silently match.
    */
  def bboxRowCollection(geom: ArrayData, kindIdx: Int, ptsIdx: Int,
      latIdx: Int, lonIdx: Int, cap: Int): InternalRow = {
    val parsed = parseCollection(geom, kindIdx, ptsIdx, latIdx, lonIdx)
    if (parsed == null) return null
    val (kinds, comps) = parsed
    if (kinds.isEmpty) return null
    if (kinds(0) == -99)
      return new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](null, null, null, null, false))
    val ringedIdx = kinds.indices.filter(kinds(_) == 0)
    var total = 0
    var i = 0
    while (i < comps.length) {
      var j = 0
      while (j < comps(i).length) { total += comps(i)(j).length >> 1; j += 1 }
      i += 1
    }
    var valid = total <= cap
    if (valid) {
      var k = 0
      while (valid && k < ringedIdx.length) {
        val rings = comps(ringedIdx(k))
        var j = 0
        while (valid && j < rings.length) {
          if ((rings(j).length >> 1) > 3 && ringSelfIntersects(rings(j)))
            valid = false
          j += 1
        }
        k += 1
      }
    }
    extentRow(comps, valid)
  }

  private def bboxOf(comps: Array[Array[Array[Double]]], ringed: Boolean,
      cap: Int): InternalRow = {
    var total = 0
    var p = 0
    while (p < comps.length) {
      var i = 0
      while (i < comps(p).length) { total += comps(p)(i).length >> 1; i += 1 }
      p += 1
    }
    var valid = total <= cap
    if (valid && ringed) {
      p = 0
      while (valid && p < comps.length) {
        var i = 0
        while (valid && i < comps(p).length) {
          val r = comps(p)(i)
          if ((r.length >> 1) > 3 && ringSelfIntersects(r)) valid = false
          i += 1
        }
        p += 1
      }
    }
    extentRow(comps, valid)
  }

  private def extentRow(comps: Array[Array[Array[Double]]],
      valid: Boolean): InternalRow = {
    var laMin = Double.MaxValue; var laMax = -Double.MaxValue
    var loMin = Double.MaxValue; var loMax = -Double.MaxValue
    var p = 0
    while (p < comps.length) {
      var i = 0
      while (i < comps(p).length) {
        val c = comps(p)(i)
        var t = 0
        while (t < c.length) {
          val la = c(t); val lo = c(t + 1)
          if (la < laMin) laMin = la
          if (la > laMax) laMax = la
          if (lo < loMin) loMin = lo
          if (lo > loMax) loMax = lo
          t += 2
        }
        i += 1
      }
      p += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](laMin, laMax, loMin, loMax, valid))
  }

  // ------------------------------------------------------- grid coverage

  private val GeohashAlphabet: Array[Byte] =
    "0123456789bcdefghjkmnpqrstuvwxyz".getBytes("UTF-8")

  /** Quantizer twin of the point-agg columns — SAME IEEE op order as
    * `geohashCol`/`geotileCol` (`floor((v + off) / span * 2^bits)`,
    * clamped), so a shape's cells and a point's cell can never drift.
    */
  private def quantAxis(v: Double, off: Double, span: Double, n: Long): Long = {
    val q = math.floor((v + off) / span * n.toDouble)
    if (q < 0.0) 0L else if (q > (n - 1).toDouble) n - 1 else q.toLong
  }

  private def mercY(lat: Double, n: Long): Long = {
    val latC = math.min(math.max(lat, -85.05112878), 85.05112878)
    val latRad = latC * (math.Pi / 180.0)
    val merc = (1.0 -
      math.log(math.tan(latRad) + 1.0 / math.cos(latRad)) / math.Pi) / 2.0
    val q = math.floor(merc * n.toDouble)
    if (q < 0.0) 0L else if (q > (n - 1).toDouble) n - 1 else q.toLong
  }

  /** Inverse mercator: the lat of tile-row boundary `y/n` (for the
    * candidate rect test; candidates themselves come from the exact
    * forward quantizer, so this only decides partial-overlap edges —
    * measure-zero under the fixture conventions).
    */
  private def invMercLat(frac: Double): Double =
    math.atan(math.sinh(math.Pi * (1.0 - 2.0 * frac))) * (180.0 / math.Pi)

  private def geohashString(ix: Long, iy: Long, p: Int): UTF8String = {
    val total = 5 * p
    val xb = (total + 1) / 2
    val yb = total / 2
    var code = 0L
    var j = 0
    while (j < xb) {
      code |= ((ix >> j) & 1L) << (if (total % 2 == 1) 2 * j else 2 * j + 1)
      j += 1
    }
    j = 0
    while (j < yb) {
      code |= ((iy >> j) & 1L) << (if (total % 2 == 1) 2 * j + 1 else 2 * j)
      j += 1
    }
    val out = new Array[Byte](p)
    var t = 0
    while (t < p) {
      out(t) = GeohashAlphabet(((code >> (5 * (p - 1 - t))) & 31L).toInt)
      t += 1
    }
    UTF8String.fromBytes(out)
  }

  /** The one per-(shape, cell-rect) intersection dispatch — the same
    * box-relation walks [[relate]] runs, minus the per-cell re-parse.
    */
  private def intersectsCell(kinds: Array[Int],
      comps: Array[Array[Array[Array[Double]]]],
      box: GeoBoxShape): Boolean = {
    var i = 0
    while (i < kinds.length) {
      val hit = kinds(i) match {
        case KindPolygon | KindRings | KindPolys =>
          ringedRelate(comps(i), kinds(i) == KindPolys, box, RelIntersects)
        case KindLinestring | KindMultiLinestring =>
          lineRelate(comps(i)(0), box, RelIntersects)
        case _ =>
          pointsRelate(comps(i)(0)(0), box, RelIntersects)
      }
      if (hit) return true
      i += 1
    }
    false
  }

  private def cellsOf(kinds: Array[Int],
      comps: Array[Array[Array[Array[Double]]]], grid: Int, p: Int,
      cellCap: Int): ArrayData = {
    // vertex extent across every component
    var laMin = Double.MaxValue; var laMax = -Double.MaxValue
    var loMin = Double.MaxValue; var loMax = -Double.MaxValue
    var g = 0
    while (g < comps.length) {
      var q = 0
      while (q < comps(g).length) {
        var i = 0
        while (i < comps(g)(q).length) {
          val c = comps(g)(q)(i)
          var t = 0
          while (t < c.length) {
            if (c(t) < laMin) laMin = c(t)
            if (c(t) > laMax) laMax = c(t)
            if (c(t + 1) < loMin) loMin = c(t + 1)
            if (c(t + 1) > loMax) loMax = c(t + 1)
            t += 2
          }
          i += 1
        }
        q += 1
      }
      g += 1
    }
    val out = new java.util.ArrayList[UTF8String]()
    if (grid == 0) {
      val total = 5 * p
      val nx = 1L << ((total + 1) / 2)
      val ny = 1L << (total / 2)
      val ix0 = quantAxis(loMin, 180.0, 360.0, nx)
      val ix1 = quantAxis(loMax, 180.0, 360.0, nx)
      val iy0 = quantAxis(laMin, 90.0, 180.0, ny)
      val iy1 = quantAxis(laMax, 90.0, 180.0, ny)
      val candidates = (ix1 - ix0 + 1) * (iy1 - iy0 + 1)
      if (candidates > cellCap)
        throw new IllegalArgumentException(
          s"geo grid doc shape covers $candidates candidate geohash cells " +
            s"at precision $p - the $cellCap cell enumeration cap (lower " +
            "the precision or pre-filter the shapes)")
      var iy = iy0
      while (iy <= iy1) {
        val latB = iy.toDouble * 180.0 / ny.toDouble - 90.0
        val latT = (iy + 1).toDouble * 180.0 / ny.toDouble - 90.0
        var ix = ix0
        while (ix <= ix1) {
          val lonL = ix.toDouble * 360.0 / nx.toDouble - 180.0
          val lonR = (ix + 1).toDouble * 360.0 / nx.toDouble - 180.0
          if (intersectsCell(kinds, comps, GeoBoxShape(latB, latT, lonL, lonR)))
            out.add(geohashString(ix, iy, p))
          ix += 1
        }
        iy += 1
      }
    } else {
      val n = 1L << p
      val x0 = quantAxis(loMin, 180.0, 360.0, n)
      val x1 = quantAxis(loMax, 180.0, 360.0, n)
      val y0 = mercY(laMax, n) // mercator y grows downward
      val y1 = mercY(laMin, n)
      val candidates = (x1 - x0 + 1) * (y1 - y0 + 1)
      if (candidates > cellCap)
        throw new IllegalArgumentException(
          s"geo grid doc shape covers $candidates candidate geotile cells " +
            s"at precision $p - the $cellCap cell enumeration cap (lower " +
            "the precision or pre-filter the shapes)")
      var y = y0
      while (y <= y1) {
        // the EDGE rows extend to the poles: mercY clamps out-of-domain
        // latitudes (beyond ±85.05112878°) into row 0 / row n−1 exactly
        // like the point arm's geotileCol clamp, so the rect test must
        // accept those vertices too — with the plain inverse-mercator
        // bounds a shape lying wholly past the domain edge would quantize
        // into row 0 yet intersect nothing and silently drop (ADVICE r15)
        val latT = if (y == 0) 90.0 else invMercLat(y.toDouble / n.toDouble)
        val latB = if (y == n - 1) -90.0
          else invMercLat((y + 1).toDouble / n.toDouble)
        var x = x0
        while (x <= x1) {
          val lonL = x.toDouble * 360.0 / n.toDouble - 180.0
          val lonR = (x + 1).toDouble * 360.0 / n.toDouble - 180.0
          if (intersectsCell(kinds, comps, GeoBoxShape(latB, latT, lonL, lonR)))
            out.add(UTF8String.fromString(s"$p/$x/$y"))
          x += 1
        }
        y += 1
      }
    }
    val arr = new Array[Any](out.size())
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  /** Grid coverage for the non-collection doc kinds (see
    * [[GeoGridCells]]): null on dirt, THROWS on poison (cap first,
    * then simplicity), else the intersecting cell ids.
    */
  def gridCells(geom: ArrayData, kind: Int, latIdx: Int, lonIdx: Int,
      grid: Int, p: Int, cap: Int, cellCap: Int): ArrayData = {
    val comps = parse(geom, kind, latIdx, lonIdx)
    if (comps == null) return null
    var total = 0
    var g = 0
    while (g < comps.length) {
      var i = 0
      while (i < comps(g).length) { total += comps(g)(i).length >> 1; i += 1 }
      g += 1
    }
    if (total > cap)
      throw new IllegalArgumentException(
        s"geo grid doc shape exceeds $cap total vertices (the kernel vertex cap)")
    if (kind == KindPolygon || kind == KindRings || kind == KindPolys) {
      g = 0
      while (g < comps.length) {
        var i = 0
        while (i < comps(g).length) {
          val r = comps(g)(i)
          if ((r.length >> 1) > 3 && ringSelfIntersects(r))
            throw new IllegalArgumentException(
              "geo grid doc ring is self-intersecting - rings must be " +
                "simple (an even-odd cell walk over a self-crossing ring " +
                "would be silently wrong)")
          i += 1
        }
        g += 1
      }
    }
    cellsOf(Array(kind), Array(comps), grid, p, cellCap)
  }

  /** Geometrycollection twin of [[gridCells]] — mixed components, the
    * relateCollection composition (any component's intersection puts
    * the shape in the cell).
    */
  def gridCellsCollection(geom: ArrayData, kindIdx: Int, ptsIdx: Int,
      latIdx: Int, lonIdx: Int, grid: Int, p: Int, cap: Int,
      cellCap: Int): ArrayData = {
    val parsed = parseCollection(geom, kindIdx, ptsIdx, latIdx, lonIdx)
    if (parsed == null) return null
    val (kinds0, comps0) = parsed
    if (kinds0.isEmpty) return null
    if (kinds0(0) == -99)
      throw new IllegalArgumentException(
        "geo grid doc geometrycollection component kind must be polygon, " +
          "linestring or point")
    var total = 0
    var i = 0
    while (i < comps0.length) {
      var j = 0
      while (j < comps0(i).length) { total += comps0(i)(j).length >> 1; j += 1 }
      i += 1
    }
    if (total > cap)
      throw new IllegalArgumentException(
        s"geo grid doc shape exceeds $cap total vertices (the kernel vertex cap)")
    i = 0
    while (i < kinds0.length) {
      if (kinds0(i) == 0) {
        var j = 0
        while (j < comps0(i).length) {
          val r = comps0(i)(j)
          if ((r.length >> 1) > 3 && ringSelfIntersects(r))
            throw new IllegalArgumentException(
              "geo grid doc ring is self-intersecting - rings must be simple")
          j += 1
        }
      }
      i += 1
    }
    // map collection component kinds (0 polygon / 1 line / 2 point)
    // onto the dispatch codes; point components flatten every chain
    // (the r15 multi-chain rule)
    val kinds = new Array[Int](kinds0.length)
    val comps = new Array[Array[Array[Array[Double]]]](kinds0.length)
    i = 0
    while (i < kinds0.length) {
      kinds0(i) match {
        case 0 =>
          kinds(i) = KindPolygon
          comps(i) = Array(comps0(i))
        case 1 =>
          kinds(i) = KindMultiLinestring
          comps(i) = Array(comps0(i))
        case _ =>
          kinds(i) = KindMultiPoint
          val chains = comps0(i)
          val flat = new Array[Double](2 * chains.length)
          var j = 0
          while (j < chains.length) {
            flat(2 * j) = chains(j)(0); flat(2 * j + 1) = chains(j)(1); j += 1
          }
          comps(i) = Array(Array(flat))
      }
      i += 1
    }
    cellsOf(kinds, comps, grid, p, cellCap)
  }

  /** Null on dirt; `(Array(-99), _)` sentinel on an unknown kind (so
    * the callers can classify it as poison rather than a drop).
    */
  private def parseCollection(geom: ArrayData, kindIdx: Int, ptsIdx: Int,
      latIdx: Int, lonIdx: Int): (Array[Int], Array[Array[Array[Double]]]) = {
    val n = geom.numElements()
    if (n < 1) return null
    val kinds = new Array[Int](n)
    val comps = new Array[Array[Array[Double]]](n)
    val badKind: (Array[Int], Array[Array[Array[Double]]]) =
      (Array(-99), Array.empty)
    var i = 0
    while (i < n) {
      if (geom.isNullAt(i)) return null
      val e = geom.getStruct(i, (kindIdx max ptsIdx) + 1)
      if (e.isNullAt(kindIdx) || e.isNullAt(ptsIdx)) return null
      val k = e.getUTF8String(kindIdx).toString match {
        case "polygon"    => 0
        case "linestring" => 1
        case "point"      => 2
        case _            => -1
      }
      if (k < 0) return badKind
      val pa = e.getArray(ptsIdx)
      val m = pa.numElements()
      if (m < 1) return null
      val chains = new Array[Array[Double]](m)
      var j = 0
      while (j < m) {
        if (pa.isNullAt(j)) return null
        val ca = pa.getArray(j)
        val cn = ca.numElements()
        val minV = if (k == 0) 3 else if (k == 1) 2 else 1
        if (cn < minV || (k == 2 && cn != 1)) return null
        val flat = new Array[Double](2 * cn)
        var t = 0
        while (t < cn) {
          if (ca.isNullAt(t)) return null
          val v = ca.getStruct(t, (latIdx max lonIdx) + 1)
          if (v.isNullAt(latIdx) || v.isNullAt(lonIdx)) return null
          flat(2 * t) = v.getDouble(latIdx)
          flat(2 * t + 1) = v.getDouble(lonIdx)
          t += 1
        }
        chains(j) = flat
        j += 1
      }
      kinds(i) = k
      comps(i) = chains
      i += 1
    }
    (kinds, comps)
  }

  // ------------------------------------------------------ ring relations

  /** Polygon-family docs (polygon / rings / polys) vs the query shape.
    * `perComponent`: polys compose some relations per GeoJSON
    * component (disjoint islands) — intersects/contains distribute
    * over components; within/vertex tests are region-global.
    */
  private def ringedRelate(comps: Array[Array[Array[Double]]],
      perComponent: Boolean, shape: GeoQueryShape, rel: Int): Boolean =
    shape match {
      case GeoBoxShape(latB, latT, lonL, lonR) =>
        def compIntersects(rings: Array[Array[Double]]): Boolean =
          anyVertexInBox(rings, latB, latT, lonL, lonR) ||
            anyCornerInRegion(rings, latB, latT, lonL, lonR) ||
            anyEdgeCrossesBox(rings, latB, latT, lonL, lonR)
        def compContains(rings: Array[Array[Double]]): Boolean =
          allCornersInRegion(rings, latB, latT, lonL, lonR) &&
            !anyEdgeCrossesBox(rings, latB, latT, lonL, lonR)
        rel match {
          case RelIntersects => comps.exists(compIntersects)
          case RelDisjoint   => !comps.exists(compIntersects)
          case RelWithin =>
            comps.forall(allVerticesInBox(_, latB, latT, lonL, lonR))
          case RelContains =>
            if (perComponent) comps.exists(compContains)
            else compContains(comps(0))
        }

      case q: GeoRegionShape => ringedVsRegion(comps, q.rings, rel)
      case q: GeoPolysShape =>
        // region semantics over the query's flattened ring set for
        // intersects/within/disjoint; contains distributes over the
        // QUERY's components (the doc must contain every island)
        val flat = q.polys.flatten
        rel match {
          case RelContains => q.polys.forall(ringedVsRegion(comps, _, RelContains))
          case r           => ringedVsRegion(comps, flat, r)
        }

      case GeoCircleShape(qLat, qLon, r) =>
        val centerIn = parityAll(comps, qLat, qLon)
        rel match {
          case RelIntersects => centerIn || minEdgeDistKm(comps, qLat, qLon) <= r
          case RelDisjoint   => !(centerIn || minEdgeDistKm(comps, qLat, qLon) <= r)
          case RelWithin     => maxVertexDistKm(comps, qLat, qLon) <= r
          case RelContains   => centerIn && minEdgeDistKm(comps, qLat, qLon) >= r
        }
    }

  /** Doc region(s) vs a query RING SET (a polygon with holes, or one
    * flattened multipolygon). Even-odd region membership both ways +
    * the proper-crossing walk (VERDICT r13 #3):
    *   - intersects: any doc vertex in the query region ∨ any query
    *     vertex in the doc region ∨ any proper edge crossing —
    *     boundary-touch-only overlap is measure-zero under the
    *     fixture rule, like every other walk;
    *   - within (doc ⊆ query): every doc vertex in the query region ∧
    *     no query vertex in the doc region (a query HOLE inside the
    *     doc would otherwise pass unseen) ∧ no proper crossing. A
    *     single strictly-convex CCW query ring keeps the exact
    *     boundary-inclusive half-plane form (the pre-existing fast
    *     path — a convex container admits neither holes nor escapes);
    *   - contains (doc ⊇ query): the mirror — every query vertex in
    *     the doc region ∧ no doc vertex in the query region (a DOC
    *     hole inside the query fails via its own vertices) ∧ no
    *     proper crossing; for multipolygon docs, SOME component
    *     contains (exact for disjoint components);
    *   - disjoint: ¬intersects.
    */
  private def ringedVsRegion(comps: Array[Array[Array[Double]]],
      qRings: Array[Array[Double]], rel: Int): Boolean = {
    def docVerts(f: (Double, Double) => Boolean, all: Boolean): Boolean = {
      var p = 0
      while (p < comps.length) {
        var i = 0
        while (i < comps(p).length) {
          val ring = comps(p)(i)
          var k = 0
          while (k < ring.length) {
            val hit = f(ring(k), ring(k + 1))
            if (all && !hit) return false
            if (!all && hit) return true
            k += 2
          }
          i += 1
        }
        p += 1
      }
      all
    }
    def anyQueryVertexIn(rings: Array[Array[Double]]): Boolean = {
      var i = 0
      while (i < qRings.length) {
        val ring = qRings(i)
        var k = 0
        while (k < ring.length) {
          if (parityRings(rings, ring(k), ring(k + 1))) return true
          k += 2
        }
        i += 1
      }
      false
    }
    def anyProperCross(rings: Array[Array[Double]]): Boolean = {
      var i = 0
      while (i < rings.length) {
        if (ringsProperCross(rings(i), qRings)) return true
        i += 1
      }
      false
    }
    val allDoc = comps.flatten
    rel match {
      case RelIntersects =>
        docVerts((la, lo) => parityRings(qRings, la, lo), all = false) ||
          anyQueryVertexIn(allDoc) || anyProperCross(allDoc)
      case RelDisjoint =>
        !(docVerts((la, lo) => parityRings(qRings, la, lo), all = false) ||
          anyQueryVertexIn(allDoc) || anyProperCross(allDoc))
      case RelWithin =>
        if (qRings.length == 1 && isConvexCcwFlat(qRings(0)))
          docVerts((la, lo) => inHalfPlanes(qRings(0), la, lo), all = true)
        else
          docVerts((la, lo) => parityRings(qRings, la, lo), all = true) &&
            !anyQueryVertexIn(allDoc) && !anyProperCross(allDoc)
      case RelContains =>
        def compContains(rings: Array[Array[Double]]): Boolean = {
          var i = 0
          while (i < qRings.length) {
            val ring = qRings(i)
            var k = 0
            while (k < ring.length) {
              if (!parityRings(rings, ring(k), ring(k + 1))) return false
              k += 2
            }
            i += 1
          }
          var p = 0
          while (p < rings.length) {
            val ring = rings(p)
            var k = 0
            while (k < ring.length) {
              if (parityRings(qRings, ring(k), ring(k + 1))) return false
              k += 2
            }
            p += 1
          }
          !anyProperCross(rings)
        }
        if (comps.length == 1) compContains(comps(0))
        else comps.exists(compContains)
    }
  }

  // ------------------------------------------------------ line relations

  /** Linestring / multilinestring docs: open chains (no closing edge,
    * no simplicity requirement) vs the query shape.
    */
  private def lineRelate(chains: Array[Array[Double]], shape: GeoQueryShape,
      rel: Int): Boolean = shape match {
    case GeoBoxShape(latB, latT, lonL, lonR) =>
      def intersects: Boolean = {
        var i = 0
        while (i < chains.length) {
          val c = chains(i)
          var k = 0
          while (k < c.length) {
            if (c(k) >= latB && c(k) <= latT && c(k + 1) >= lonL &&
              c(k + 1) <= lonR) return true
            k += 2
          }
          k = 0
          while (k < c.length - 2) {
            if (edgeCrossesBox(c(k), c(k + 1), c(k + 2), c(k + 3),
              latB, latT, lonL, lonR)) return true
            k += 2
          }
          i += 1
        }
        false
      }
      rel match {
        case RelIntersects => intersects
        case RelDisjoint   => !intersects
        case RelWithin =>
          def chainIn(c: Array[Double]): Boolean = {
            var k = 0
            while (k < c.length) {
              if (!(c(k) >= latB && c(k) <= latT && c(k + 1) >= lonL &&
                c(k + 1) <= lonR)) return false
              k += 2
            }
            true
          }
          chains.forall(chainIn)
        // contains: a 1-D geometry can contain only a zero-area query
        // — the compile path enforces zeroArea, so this IS the
        // point-on-line test (the degenerate-box intersects)
        case RelContains => intersects
      }
    case GeoCircleShape(qLat, qLon, r) =>
      val chainsAsComps = Array(chains)
      rel match {
        case RelIntersects => minChainDistKm(chains, qLat, qLon) <= r
        case RelDisjoint   => !(minChainDistKm(chains, qLat, qLon) <= r)
        case RelWithin     => maxVertexDistKm(chainsAsComps, qLat, qLon) <= r
        case RelContains   => false // enforced unreachable at compile
      }
    case _ =>
      throw new IllegalStateException("linestring docs take envelope/point/circle query shapes")
  }

  // ----------------------------------------------------- point relations

  /** Multipoint docs: a bag of coordinates vs the query shape. */
  private def pointsRelate(pts: Array[Double], shape: GeoQueryShape,
      rel: Int): Boolean = {
    def each(f: (Double, Double) => Boolean, all: Boolean): Boolean = {
      var k = 0
      while (k < pts.length) {
        val hit = f(pts(k), pts(k + 1))
        if (all && !hit) return false
        if (!all && hit) return true
        k += 2
      }
      all
    }
    shape match {
      case GeoBoxShape(latB, latT, lonL, lonR) =>
        def in(la: Double, lo: Double) =
          la >= latB && la <= latT && lo >= lonL && lo <= lonR
        rel match {
          case RelIntersects => each(in, all = false)
          case RelDisjoint   => !each(in, all = false)
          case RelWithin     => each(in, all = true)
          // contains: points have no area — the compile path enforces
          // a zero-area query, making this the exact-membership test
          case RelContains   => each(in, all = false)
        }
      case GeoCircleShape(qLat, qLon, r) =>
        def in(la: Double, lo: Double) = haversineKm(la, lo, qLat, qLon) <= r
        rel match {
          case RelIntersects => each(in, all = false)
          case RelDisjoint   => !each(in, all = false)
          case RelWithin     => each(in, all = true)
          case RelContains   => false // enforced unreachable at compile
        }
      case _ =>
        throw new IllegalStateException("multipoint docs take envelope/point/circle query shapes")
    }
  }

  // ----------------------------------------------- query-side membership

  /** Point-doc membership (the >64-vertex routing of the query-side
    * walks): single strictly-convex CCW ring → boundary-inclusive
    * half-planes (the convexRingPredicate formula); anything else →
    * even-odd crossing parity (the crossingParityPredicate formula).
    * Multipolygon: OR of per-polygon membership, each routed the same
    * way — exactly the unrolled perPoly composition.
    */
  def pointInShape(lat: Double, lon: Double, shape: GeoQueryShape): Boolean =
    shape match {
      case q: GeoRegionShape =>
        if (q.rings.length == 1 && isConvexCcwFlat(q.rings(0)))
          inHalfPlanes(q.rings(0), lat, lon)
        else parityRings(q.rings, lat, lon)
      case q: GeoPolysShape =>
        var p = 0
        while (p < q.polys.length) {
          val rings = q.polys(p)
          val in =
            if (rings.length == 1 && isConvexCcwFlat(rings(0)))
              inHalfPlanes(rings(0), lat, lon)
            else parityRings(rings, lat, lon)
          if (in) return true
          p += 1
        }
        false
      case _ =>
        throw new IllegalStateException("pointInShape takes polygon shapes")
    }

  // ------------------------------------------------------------- kernels

  /** Even-odd crossing parity of (py=lat, px=lon) vs the closed rings
    * (stored open): the +lon-ray walk — for each edge spanning the
    * point's latitude, count a crossing when the point sits on the
    * edge's ray side, by the SIGN of the same cross product every
    * engine path uses. Horizontal edges never span. A NaN coordinate
    * never counts (every comparison is false) — matching the Column
    * walk's `when(...).otherwise(0)`.
    */
  def parityRings(rings: Array[Array[Double]], py: Double, px: Double): Boolean = {
    var c = 0
    var i = 0
    while (i < rings.length) {
      val r = rings(i)
      val n = r.length >> 1
      var k = 0
      while (k < n) {
        val aLat = r(2 * k); val aLon = r(2 * k + 1)
        val j = if (k + 1 == n) 0 else k + 1
        val bLat = r(2 * j); val bLon = r(2 * j + 1)
        if ((aLat > py) != (bLat > py)) {
          val cross = (bLon - aLon) * (py - aLat) - (bLat - aLat) * (px - aLon)
          if (if (bLat > aLat) cross > 0.0 else cross < 0.0) c += 1
        }
        k += 1
      }
      i += 1
    }
    (c & 1) == 1
  }

  private def parityAll(comps: Array[Array[Array[Double]]], py: Double,
      px: Double): Boolean = {
    // region parity across ALL components' rings (even-odd: disjoint
    // components XOR like shell+holes — exact for disjoint islands)
    var c = 0
    var p = 0
    while (p < comps.length) {
      if (parityRings(comps(p), py, px)) c += 1
      p += 1
    }
    (c & 1) == 1
  }

  /** Boundary-inclusive half-plane membership for ONE strictly-convex
    * CCW ring — the convexRingPredicate formula:
    * `(lon2-lon1)*(lat-lat1) - (lat2-lat1)*(lon-lon1) >= 0` per edge.
    */
  def inHalfPlanes(ring: Array[Double], lat: Double, lon: Double): Boolean = {
    val n = ring.length >> 1
    var k = 0
    while (k < n) {
      val lat1 = ring(2 * k); val lon1 = ring(2 * k + 1)
      val j = if (k + 1 == n) 0 else k + 1
      val lat2 = ring(2 * j); val lon2 = ring(2 * j + 1)
      if (!((lon2 - lon1) * (lat - lat1) - (lat2 - lat1) * (lon - lon1) >= 0.0))
        return false
      k += 1
    }
    true
  }

  /** Strictly-convex CCW probe (the isConvexCcw formula on a flat
    * ring): every turn's cross product strictly positive.
    */
  def isConvexCcwFlat(ring: Array[Double]): Boolean = {
    val n = ring.length >> 1
    var i = 0
    while (i < n) {
      val aLat = ring(2 * i); val aLon = ring(2 * i + 1)
      val j = if (i + 1 == n) 0 else i + 1
      val bLat = ring(2 * j); val bLon = ring(2 * j + 1)
      val k = if (j + 1 == n) 0 else j + 1
      val cLat = ring(2 * k); val cLon = ring(2 * k + 1)
      if (!((bLon - aLon) * (cLat - bLat) - (bLat - aLat) * (cLon - bLon) > 0.0))
        return false
      i += 1
    }
    true
  }

  private def anyVertexInBox(rings: Array[Array[Double]], latB: Double,
      latT: Double, lonL: Double, lonR: Double): Boolean = {
    var i = 0
    while (i < rings.length) {
      val r = rings(i)
      var k = 0
      while (k < r.length) {
        if (r(k) >= latB && r(k) <= latT && r(k + 1) >= lonL &&
          r(k + 1) <= lonR) return true
        k += 2
      }
      i += 1
    }
    false
  }

  private def allVerticesInBox(rings: Array[Array[Double]], latB: Double,
      latT: Double, lonL: Double, lonR: Double): Boolean = {
    var i = 0
    while (i < rings.length) {
      val r = rings(i)
      var k = 0
      while (k < r.length) {
        if (!(r(k) >= latB && r(k) <= latT && r(k + 1) >= lonL &&
          r(k + 1) <= lonR)) return false
        k += 2
      }
      i += 1
    }
    true
  }

  /** The box's distinct corners, in the pinned walk order. */
  private def boxCorners(latB: Double, latT: Double, lonL: Double,
      lonR: Double): Array[Double] =
    if (latB == latT && lonL == lonR) Array(latB, lonL)
    else if (latB == latT) Array(latB, lonL, latB, lonR)
    else if (lonL == lonR) Array(latB, lonL, latT, lonL)
    else Array(latB, lonL, latT, lonL, latB, lonR, latT, lonR)

  private def anyCornerInRegion(rings: Array[Array[Double]], latB: Double,
      latT: Double, lonL: Double, lonR: Double): Boolean = {
    val cs = boxCorners(latB, latT, lonL, lonR)
    var k = 0
    while (k < cs.length) {
      if (parityRings(rings, cs(k), cs(k + 1))) return true
      k += 2
    }
    false
  }

  private def allCornersInRegion(rings: Array[Array[Double]], latB: Double,
      latT: Double, lonL: Double, lonR: Double): Boolean = {
    val cs = boxCorners(latB, latT, lonL, lonR)
    var k = 0
    while (k < cs.length) {
      if (!parityRings(rings, cs(k), cs(k + 1))) return false
      k += 2
    }
    true
  }

  /** Segment-vs-box separating test: bounding boxes overlap AND the
    * four box corners are not strictly on one side of the segment's
    * line — the edgeCross SQL, operand order preserved.
    */
  def edgeCrossesBox(aLat: Double, aLon: Double, bLat: Double, bLon: Double,
      latB: Double, latT: Double, lonL: Double, lonR: Double): Boolean = {
    if (!(math.min(aLat, bLat) <= latT && math.max(aLat, bLat) >= latB &&
      math.min(aLon, bLon) <= lonR && math.max(aLon, bLon) >= lonL))
      return false
    def side(cx: Double, cy: Double): Double =
      (bLon - aLon) * (cy - aLat) - (bLat - aLat) * (cx - aLon)
    val s1 = side(lonL, latB); val s2 = side(lonL, latT)
    val s3 = side(lonR, latB); val s4 = side(lonR, latT)
    val strictSame = (s1 > 0.0 && s2 > 0.0 && s3 > 0.0 && s4 > 0.0) ||
      (s1 < 0.0 && s2 < 0.0 && s3 < 0.0 && s4 < 0.0)
    !strictSame
  }

  private def anyEdgeCrossesBox(rings: Array[Array[Double]], latB: Double,
      latT: Double, lonL: Double, lonR: Double): Boolean = {
    var i = 0
    while (i < rings.length) {
      val r = rings(i)
      val n = r.length >> 1
      var k = 0
      while (k < n) {
        val j = if (k + 1 == n) 0 else k + 1
        if (edgeCrossesBox(r(2 * k), r(2 * k + 1), r(2 * j), r(2 * j + 1),
          latB, latT, lonL, lonR)) return true
        k += 1
      }
      i += 1
    }
    false
  }

  private def sgn(v: Double): Int = if (v > 0) 1 else if (v < 0) -1 else 0

  /** Proper crossing (o₁o₂ < 0 ∧ o₃o₄ < 0 — tangent touches excluded,
    * the within-walk convention) between any edge of `ring` (closed)
    * and any edge of the query ring set.
    */
  private def ringsProperCross(ring: Array[Double],
      qRings: Array[Array[Double]]): Boolean = {
    val n = ring.length >> 1
    var k = 0
    while (k < n) {
      val aLat = ring(2 * k); val aLon = ring(2 * k + 1)
      val j = if (k + 1 == n) 0 else k + 1
      val bLat = ring(2 * j); val bLon = ring(2 * j + 1)
      var qi = 0
      while (qi < qRings.length) {
        val q = qRings(qi)
        val m = q.length >> 1
        var t = 0
        while (t < m) {
          val cLat = q(2 * t); val cLon = q(2 * t + 1)
          val u = if (t + 1 == m) 0 else t + 1
          val dLat = q(2 * u); val dLon = q(2 * u + 1)
          // orient of query endpoints vs the doc edge, then doc
          // endpoints vs the query edge (the anyProperCross formula)
          val o1 = sgn((bLon - aLon) * (cLat - aLat) - (bLat - aLat) * (cLon - aLon))
          val o2 = sgn((bLon - aLon) * (dLat - aLat) - (bLat - aLat) * (dLon - aLon))
          val o3 = sgn((dLon - cLon) * (aLat - cLat) - (dLat - cLat) * (aLon - cLon))
          val o4 = sgn((dLon - cLon) * (bLat - cLat) - (dLat - cLat) * (bLon - cLon))
          if (o1 * o2 < 0 && o3 * o4 < 0) return true
          t += 1
        }
        qi += 1
      }
      k += 1
    }
    false
  }

  /** Ring simplicity: does any non-adjacent edge pair intersect
    * (proper or collinear touch — the selfIntersectSql test)? The pair
    * walk is pruned by a latitude sweep (edges sorted by min lat; the
    * inner scan stops once the next edge's min lat clears this edge's
    * max lat) — near-linear on honest spatially-local rings, O(n²)
    * bbox probes worst case, bounded by the vertex cap either way.
    */
  def ringSelfIntersects(ring: Array[Double]): Boolean = {
    val n = ring.length >> 1
    if (n <= 3) return false
    // edge k: (v_k, v_{k+1 mod n})
    def eLat1(k: Int) = ring(2 * k)
    def eLon1(k: Int) = ring(2 * k + 1)
    def eLat2(k: Int) = { val j = if (k + 1 == n) 0 else k + 1; ring(2 * j) }
    def eLon2(k: Int) = { val j = if (k + 1 == n) 0 else k + 1; ring(2 * j + 1) }

    def segTouch(p1la: Double, p1lo: Double, p2la: Double, p2lo: Double,
        q1la: Double, q1lo: Double, q2la: Double, q2lo: Double): Boolean = {
      // the selfIntersectSql orientation test: lon is x, lat is y
      def orient(ax: Double, ay: Double, bx: Double, by: Double,
          cx: Double, cy: Double): Int =
        sgn((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
      def onSeg(ax: Double, ay: Double, bx: Double, by: Double,
          px: Double, py: Double): Boolean =
        px >= math.min(ax, bx) && px <= math.max(ax, bx) &&
          py >= math.min(ay, by) && py <= math.max(ay, by)
      val o1 = orient(p1lo, p1la, p2lo, p2la, q1lo, q1la)
      val o2 = orient(p1lo, p1la, p2lo, p2la, q2lo, q2la)
      val o3 = orient(q1lo, q1la, q2lo, q2la, p1lo, p1la)
      val o4 = orient(q1lo, q1la, q2lo, q2la, p2lo, p2la)
      (o1 * o2 < 0 && o3 * o4 < 0) ||
        (o1 == 0 && onSeg(p1lo, p1la, p2lo, p2la, q1lo, q1la)) ||
        (o2 == 0 && onSeg(p1lo, p1la, p2lo, p2la, q2lo, q2la)) ||
        (o3 == 0 && onSeg(q1lo, q1la, q2lo, q2la, p1lo, p1la)) ||
        (o4 == 0 && onSeg(q1lo, q1la, q2lo, q2la, p2lo, p2la))
    }

    def pairHits(i: Int, j: Int): Boolean = {
      val adjacent = j == i + 1 || (i == 0 && j == n - 1)
      if (adjacent) return false
      // cheap bbox reject before the orientation tests
      val iMinLa = math.min(eLat1(i), eLat2(i)); val iMaxLa = math.max(eLat1(i), eLat2(i))
      val jMinLa = math.min(eLat1(j), eLat2(j)); val jMaxLa = math.max(eLat1(j), eLat2(j))
      if (iMaxLa < jMinLa || jMaxLa < iMinLa) return false
      val iMinLo = math.min(eLon1(i), eLon2(i)); val iMaxLo = math.max(eLon1(i), eLon2(i))
      val jMinLo = math.min(eLon1(j), eLon2(j)); val jMaxLo = math.max(eLon1(j), eLon2(j))
      if (iMaxLo < jMinLo || jMaxLo < iMinLo) return false
      segTouch(eLat1(i), eLon1(i), eLat2(i), eLon2(i),
        eLat1(j), eLon1(j), eLat2(j), eLon2(j))
    }

    if (n <= 128) {
      // small rings: the direct pair walk (the historical shape)
      var i = 0
      while (i < n - 2) {
        var j = i + 2
        val jMax = if (i == 0) n - 2 else n - 1
        while (j <= jMax) {
          if (pairHits(i, j)) return true
          j += 1
        }
        i += 1
      }
      false
    } else {
      // latitude sweep: sort edge ids by min lat; for each, scan
      // forward only while the candidate's min lat is under this
      // edge's max lat (non-overlapping lat bands cannot intersect)
      val ids = Array.range(0, n)
      val minLa = new Array[Double](n)
      val maxLa = new Array[Double](n)
      var k = 0
      while (k < n) {
        minLa(k) = math.min(eLat1(k), eLat2(k))
        maxLa(k) = math.max(eLat1(k), eLat2(k))
        k += 1
      }
      val sorted = ids.sortBy(minLa)
      var a = 0
      while (a < n) {
        val i = sorted(a)
        var b = a + 1
        while (b < n && minLa(sorted(b)) <= maxLa(i)) {
          val j = sorted(b)
          if (pairHits(math.min(i, j), math.max(i, j))) return true
          b += 1
        }
        a += 1
      }
      false
    }
  }

  // ------------------------------------------------------ circle kernels

  /** The engine's ONE haversine as a JVM function: 6-dp-rounded km,
    * identical IEEE operand order to the q125 Column recipe (the
    * `geo_distance` / `_geo_distance` formula), so circle query shapes
    * on point docs and on doc geometries can never drift. The rounding
    * replicates Spark's `round(x, 6)` on doubles (shortest-decimal
    * BigDecimal, HALF_UP) — pinned by GeoWalkSpec against the Column
    * form.
    */
  /** Conservative OUTER bbox of a query shape — a (latB, latT, lonL,
    * lonR) box GUARANTEED to contain the shape, for the sidecar
    * pre-filters (r15): pruning on a superset box keeps every possible
    * kernel match. Box/polygon/multipolygon edges are straight in
    * lat/lon space, so the vertex extent is exact; the circle expands
    * by spherical bounds under the pinned haversine — meridian arc
    * dLat = r/R exactly, and the lon offset from
    * `sin(dlo/2) ≤ sin(r/2R)/√(cos latP · cos latC) ≤ sin(r/2R)/cosMin`
    * over the lat band (full lon range when the band touches a pole) —
    * each padded by 1e-7° against the 6-dp haversine rounding.
    */
  def outerBbox(shape: GeoQueryShape): (Double, Double, Double, Double) =
    shape match {
      case GeoBoxShape(b, t, l, r) => (b, t, l, r)
      case q: GeoRegionShape      => vertexExtent(Array(q.rings))
      case q: GeoPolysShape       => vertexExtent(q.polys)
      case GeoCircleShape(la, lo, rKm) =>
        val R = 12742.0176 / 2.0
        val dLat = math.toDegrees(rKm / R) + 1e-7
        val latB = math.max(-90.0, la - dLat)
        val latT = math.min(90.0, la + dLat)
        if (la - dLat <= -90.0 || la + dLat >= 90.0)
          (latB, latT, -180.0, 180.0)
        else {
          val cosMin = math.min(math.cos(math.toRadians(la - dLat)),
            math.cos(math.toRadians(la + dLat)))
          val s = math.sin(rKm / (2.0 * R)) / cosMin
          if (s >= 1.0) (latB, latT, -180.0, 180.0)
          else {
            val dLon = math.toDegrees(2.0 * math.asin(s)) + 1e-7
            (latB, latT, lo - dLon, lo + dLon)
          }
        }
    }

  /** INNER bbox of a query shape — a box GUARANTEED to lie inside the
    * shape's tight bbox, for the `contains` pre-filter (doc ⊇ query ⟹
    * query's tight bbox ⊆ doc bbox ⟹ this inner box ⊆ doc bbox —
    * testing the inner box is necessary, hence safe). Box / polygon
    * extents are tight already; the circle keeps its exact meridian
    * extent (the N/S extreme points sit at the center's longitude),
    * deflated 1e-7° against the haversine rounding.
    */
  def innerBbox(shape: GeoQueryShape): (Double, Double, Double, Double) =
    shape match {
      case GeoCircleShape(la, lo, rKm) =>
        val R = 12742.0176 / 2.0
        val dLat = math.max(0.0, math.toDegrees(rKm / R) - 1e-7)
        (la - dLat, la + dLat, lo, lo)
      case other => outerBbox(other)
    }

  private def vertexExtent(polys: Array[Array[Array[Double]]])
      : (Double, Double, Double, Double) = {
    var laMin = Double.MaxValue; var laMax = -Double.MaxValue
    var loMin = Double.MaxValue; var loMax = -Double.MaxValue
    var p = 0
    while (p < polys.length) {
      var i = 0
      while (i < polys(p).length) {
        val c = polys(p)(i)
        var t = 0
        while (t < c.length) {
          if (c(t) < laMin) laMin = c(t)
          if (c(t) > laMax) laMax = c(t)
          if (c(t + 1) < loMin) loMin = c(t + 1)
          if (c(t + 1) > loMax) loMax = c(t + 1)
          t += 2
        }
        i += 1
      }
      p += 1
    }
    (laMin, laMax, loMin, loMax)
  }

  def haversineKm(lat: Double, lon: Double, qLat: Double, qLon: Double): Double = {
    val pi = math.Pi
    val sdlat = math.sin((lat - qLat) * pi / 180.0 / 2.0)
    val sdlon = math.sin((lon - qLon) * pi / 180.0 / 2.0)
    val raw = 12742.0176 * math.asin(math.sqrt(
      sdlat * sdlat +
        math.cos(qLat * pi / 180.0) * math.cos(lat * pi / 180.0) *
          sdlon * sdlon))
    new java.math.BigDecimal(java.lang.Double.toString(raw))
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Min 6-dp haversine km from the query point to a SEGMENT: closest
    * point by the planar clamp (t = projection parameter clamped to
    * [0,1] in raw lat/lon coordinates — exact for the axis-aligned
    * fixtures, documented approximation for oblique segments at
    * continental scale), then the pinned haversine to it.
    */
  def segDistKm(aLat: Double, aLon: Double, bLat: Double, bLon: Double,
      qLat: Double, qLon: Double): Double = {
    val dLat = bLat - aLat
    val dLon = bLon - aLon
    val len2 = dLat * dLat + dLon * dLon
    val t0 = if (len2 == 0.0) 0.0
      else ((qLat - aLat) * dLat + (qLon - aLon) * dLon) / len2
    val t = if (t0 < 0.0) 0.0 else if (t0 > 1.0) 1.0 else t0
    haversineKm(aLat + t * dLat, aLon + t * dLon, qLat, qLon)
  }

  private def minEdgeDistKm(comps: Array[Array[Array[Double]]], qLat: Double,
      qLon: Double): Double = {
    var best = Double.MaxValue
    var p = 0
    while (p < comps.length) {
      var i = 0
      while (i < comps(p).length) {
        val r = comps(p)(i)
        val n = r.length >> 1
        var k = 0
        while (k < n) {
          val j = if (k + 1 == n) 0 else k + 1
          val d = segDistKm(r(2 * k), r(2 * k + 1), r(2 * j), r(2 * j + 1),
            qLat, qLon)
          if (d < best) best = d
          k += 1
        }
        i += 1
      }
      p += 1
    }
    best
  }

  private def minChainDistKm(chains: Array[Array[Double]], qLat: Double,
      qLon: Double): Double = {
    var best = Double.MaxValue
    var i = 0
    while (i < chains.length) {
      val c = chains(i)
      if (c.length == 2) {
        val d = haversineKm(c(0), c(1), qLat, qLon)
        if (d < best) best = d
      }
      var k = 0
      while (k < c.length - 2) {
        val d = segDistKm(c(k), c(k + 1), c(k + 2), c(k + 3), qLat, qLon)
        if (d < best) best = d
        k += 2
      }
      i += 1
    }
    best
  }

  private def maxVertexDistKm(comps: Array[Array[Array[Double]]], qLat: Double,
      qLon: Double): Double = {
    var worst = 0.0
    var p = 0
    while (p < comps.length) {
      var i = 0
      while (i < comps(p).length) {
        val r = comps(p)(i)
        var k = 0
        while (k < r.length) {
          val d = haversineKm(r(k), r(k + 1), qLat, qLon)
          if (d > worst) worst = d
          k += 2
        }
        i += 1
      }
      p += 1
    }
    worst
  }
}
