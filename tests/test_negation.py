"""Port of NegationQuerySuite (NonRecursiveQuerySuites.scala:218-273):
anti-joins, multi-rule negation, negation over aggregates."""

from .conftest import run_case
from .golden import ADDRESS, COURSE, EMPLOYEE, ENROLLED, STUDENT, TAKEN

DATABASE = (
    "database({"
    "student(StudentId:integer, FirstName:string, LastName:string, GradeYear:integer),"
    "course(Name:string, CourseId:integer, Units:integer),"
    "taken(StudentId:integer, CourseId:integer, Grade:string),"
    "enrolled(StudentId:integer, CourseId:integer)"
    "})."
)
DATA = {"student": STUDENT, "course": COURSE, "taken": TAKEN, "enrolled": ENROLLED}


def test_simple_negation(spark):
    database = (
        "database({"
        "employee(EmployeeId:integer, DepartmentId:integer, FirstName:string, LastName:string),"
        "address(EmployeeId:integer, Street:string, City:string, State:string, Zip:integer)})."
    )
    program = database + (
        "employee_missing_address(EmployeeID) <- "
        "employee(EmployeeID, _,_,_), ~address(EmployeeID, _,_,_,_)."
    )
    run_case(spark, program, "employee_missing_address(EmployeeId).",
             {"employee": EMPLOYEE, "address": ADDRESS}, [(3,)])


def test_negation_with_constant(spark):
    program = DATABASE + (
        "cannot_graduate(FirstName, LastName) <- "
        "student(StudentId, FirstName, LastName, _), ~taken(StudentId, 100, _)."
    )
    run_case(spark, program, "cannot_graduate(FirstName,LastName).", DATA,
             [("Fred", "Flintstone"), ("Barney", "Rubble"),
              ("Wilma", "Flintstone"), ("Bam Bam", "Rubble")])


def test_multi_rule_negation_with_comments(spark):
    program = DATABASE + (
        "% can only take course 50 if you haven't already taken course 100\n"
        "can_take_course_50(StudentId) <- student(StudentId, _, _, _), ~taken(StudentId, 100, _)."
        " % can only take course 50 if you haven't already taken course 50\n"
        "can_take_course_50(StudentId) <- student(StudentId, _, _, _), ~taken(StudentId, 50, _)."
    )
    run_case(spark, program, "can_take_course_50(StudentId)", DATA,
             [(1000,), (1001,), (1004,), (1005,)])


def test_negation_over_aggregate(spark):
    program = DATABASE + (
        "enrolled_units(StudentId, sum<Units>) <- enrolled(StudentId, CourseId), course(_, CourseId, Units)."
        "exceeded_allowable_units(StudentId) <- enrolled_units(StudentId, N), N > 12."
        "can_enroll(StudentId, CourseId) <- student(StudentId, _, _, _), course(_, CourseId, _), "
        "~exceeded_allowable_units(StudentId), ~taken(StudentId, CourseId, _)."
    )
    expected = [
        (1000, 13), (1000, 14), (1000, 31), (1000, 50), (1000, 100),
        (1001, 13), (1001, 14), (1001, 31), (1001, 50), (1001, 100),
        (1004, 13), (1004, 14), (1004, 50), (1004, 100),
        (1005, 13), (1005, 14), (1005, 31), (1005, 100),
    ]
    run_case(spark, program, "can_enroll(StudentId, CourseId)", DATA, expected)
